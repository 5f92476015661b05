"""Legacy Guo-et-al text-to-motion evaluator zoo (HumanML3D/KIT protocol).

Flax re-implementations of codes/datasets/evaluator_models.py:11-438 —
the BiGRU text/motion co-embedding models behind R-precision / matching
score on HumanML3D and KIT, the movement conv auto-encoder, the VAE text
decoders, the word-attention layer, and the motion-length estimator. In the
reference's NTU path these are dormant (SURVEY.md §2.7); they are provided
for protocol parity with the t2m/kit datasets.

torch's pack_padded_sequence semantics are reproduced with masked
``lax.scan`` GRUs: hidden states freeze once a sequence's valid length is
exhausted, and the backward direction runs over the per-sequence-reversed
valid region.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn


def contrastive_loss(output1, output2, label, margin: float = 3.0):
    """(ref: evaluator_models.py:11-24)"""
    dist = jnp.linalg.norm(output1 - output2, axis=-1)
    return jnp.mean(
        (1 - label) * dist**2 + label * jnp.clip(margin - dist, 0.0, None) ** 2
    )


def reparameterize(rng, mu, logvar):
    """(ref: evaluator_models.py:35-38)"""
    std = jnp.exp(0.5 * logvar)
    return mu + std * jax.random.normal(rng, mu.shape, mu.dtype)


def positional_encoding_table(d_model: int, max_len: int = 300) -> jax.Array:
    """(ref: evaluator_models.py:62-76)"""
    position = jnp.arange(max_len, dtype=jnp.float32)[:, None]
    div = jnp.exp(
        jnp.arange(0, d_model, 2, dtype=jnp.float32) * (-math.log(10000.0) / d_model)
    )
    pe = jnp.zeros((max_len, d_model))
    pe = pe.at[:, 0::2].set(jnp.sin(position * div))
    pe = pe.at[:, 1::2].set(jnp.cos(position * div))
    return pe


def _flip_valid(x: jax.Array, lengths: jax.Array) -> jax.Array:
    """Reverse each (B, T, D) sequence within its valid length."""
    T = x.shape[1]
    t = jnp.arange(T)
    idx = jnp.where(t[None, :] < lengths[:, None], lengths[:, None] - 1 - t[None, :], t[None, :])
    return jnp.take_along_axis(x, idx[..., None], axis=1)


class MaskedGRU(nn.Module):
    """Unidirectional GRU over (B, T, D) that freezes finished sequences
    (pack_padded_sequence equivalent)."""

    hidden_size: int

    @nn.compact
    def __call__(self, x: jax.Array, lengths: jax.Array, h0: jax.Array):
        cell = nn.GRUCell(features=self.hidden_size)
        T = x.shape[1]
        mask = (jnp.arange(T)[None, :] < lengths[:, None]).astype(x.dtype)

        def scan_fn(cell, carry, inp):
            h = carry
            x_t, m_t = inp
            h_new, _ = cell(h, x_t)
            h = m_t[:, None] * h_new + (1 - m_t[:, None]) * h
            return h, h

        scan = nn.scan(
            scan_fn, variable_broadcast="params", split_rngs={"params": False},
            in_axes=1, out_axes=1,
        )
        last, seq = scan(cell, h0, (x, mask))
        return seq, last


class BiGRU(nn.Module):
    """Bidirectional masked GRU with learned initial hidden states.

    Returns (seq (B, T, 2H) with the backward half re-aligned to forward
    time order, last (B, 2H)) — the reference's TextEncoderBiGRU output
    convention (evaluator_models.py:285-308).
    """

    hidden_size: int

    @nn.compact
    def __call__(self, x: jax.Array, lengths: jax.Array):
        B = x.shape[0]
        h0 = self.param("hidden", nn.initializers.normal(1.0), (2, 1, self.hidden_size))
        fwd_seq, fwd_last = MaskedGRU(self.hidden_size, name="fwd")(
            x, lengths, jnp.broadcast_to(h0[0], (B, self.hidden_size))
        )
        x_rev = _flip_valid(x, lengths)
        bwd_seq, bwd_last = MaskedGRU(self.hidden_size, name="bwd")(
            x_rev, lengths, jnp.broadcast_to(h0[1], (B, self.hidden_size))
        )
        bwd_seq = _flip_valid(bwd_seq, lengths)
        seq = jnp.concatenate([fwd_seq, bwd_seq], axis=-1)
        last = jnp.concatenate([fwd_last, bwd_last], axis=-1)
        return seq, last


def _mlp_head(features: list[int], name: str = "output_net"):
    layers = []
    for i, f in enumerate(features[:-1]):
        layers.append(nn.Dense(f))
        layers.append(nn.LayerNorm())
        layers.append(lambda x: nn.leaky_relu(x, 0.2))
    layers.append(nn.Dense(features[-1]))
    return nn.Sequential(layers, name=name)


class TextEncoderBiGRU(nn.Module):
    """(ref: evaluator_models.py:267-308)"""

    word_size: int
    pos_size: int
    hidden_size: int

    @nn.compact
    def __call__(self, word_embs, pos_onehot, cap_lens):
        pos = nn.Dense(self.word_size, name="pos_emb")(pos_onehot)
        x = nn.Dense(self.hidden_size, name="input_emb")(word_embs + pos)
        return BiGRU(self.hidden_size, name="gru")(x, cap_lens)


class TextEncoderBiGRUCo(nn.Module):
    """(ref: evaluator_models.py:311-350) — text side of the co-embedding."""

    word_size: int
    pos_size: int
    hidden_size: int
    output_size: int

    @nn.compact
    def __call__(self, word_embs, pos_onehot, cap_lens):
        pos = nn.Dense(self.word_size, name="pos_emb")(pos_onehot)
        x = nn.Dense(self.hidden_size, name="input_emb")(word_embs + pos)
        _, last = BiGRU(self.hidden_size, name="gru")(x, cap_lens)
        return _mlp_head([self.hidden_size, self.output_size])(last)


class MotionEncoderBiGRUCo(nn.Module):
    """(ref: evaluator_models.py:353-386) — motion side of the co-embedding."""

    input_size: int
    hidden_size: int
    output_size: int

    @nn.compact
    def __call__(self, inputs, m_lens):
        x = nn.Dense(self.hidden_size, name="input_emb")(inputs)
        _, last = BiGRU(self.hidden_size, name="gru")(x, m_lens)
        return _mlp_head([self.hidden_size, self.output_size])(last)


class MotionLenEstimatorBiGRU(nn.Module):
    """(ref: evaluator_models.py:389-438)"""

    word_size: int
    pos_size: int
    hidden_size: int
    output_size: int

    @nn.compact
    def __call__(self, word_embs, pos_onehot, cap_lens):
        pos = nn.Dense(self.word_size, name="pos_emb")(pos_onehot)
        x = nn.Dense(self.hidden_size, name="input_emb")(word_embs + pos)
        _, last = BiGRU(self.hidden_size, name="gru")(x, cap_lens)
        nd = 512
        return _mlp_head([nd, nd // 2, nd // 4, self.output_size], name="output")(last)


class AttLayer(nn.Module):
    """Word-level attention (ref: evaluator_models.py:232-264)."""

    value_dim: int

    @nn.compact
    def __call__(self, query, key_mat):
        q = nn.Dense(self.value_dim, name="W_q")(query)[..., None]  # (B, V, 1)
        v = nn.Dense(self.value_dim, name="W_v")(key_mat)
        k = nn.Dense(self.value_dim, use_bias=False, name="W_k")(key_mat)
        weights = (k @ q) / jnp.sqrt(jnp.asarray(self.value_dim, q.dtype))
        co = jax.nn.softmax(weights, axis=1)
        return jnp.sum(v * co, axis=1), co


class MovementConvEncoder(nn.Module):
    """Strided temporal conv encoder (ref: evaluator_models.py:79-98).

    (B, T, D) → (B, T//4, output_size).
    """

    hidden_size: int
    output_size: int
    dropout: float = 0.2

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Conv(self.hidden_size, (4,), strides=(2,), padding=[(1, 1)])(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.leaky_relu(x, 0.2)
        x = nn.Conv(self.output_size, (4,), strides=(2,), padding=[(1, 1)])(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.leaky_relu(x, 0.2)
        return nn.Dense(self.output_size, name="out_net")(x)


class MovementConvDecoder(nn.Module):
    """(ref: evaluator_models.py:101-120)"""

    hidden_size: int
    output_size: int

    @nn.compact
    def __call__(self, x):
        # 'SAME' gives exact 2× temporal upsampling (torch k=4,s=2,p=1 shape)
        x = nn.ConvTranspose(self.hidden_size, (4,), strides=(2,), padding="SAME")(x)
        x = nn.leaky_relu(x, 0.2)
        x = nn.ConvTranspose(self.output_size, (4,), strides=(2,), padding="SAME")(x)
        x = nn.leaky_relu(x, 0.2)
        return nn.Dense(self.output_size, name="out_net")(x)


class TextVAEDecoder(nn.Module):
    """Autoregressive GRU motion decoder (ref: evaluator_models.py:123-184).

    Call per step: (inputs (B, D_in), hidden list, position p) → (pose, hidden).
    """

    text_size: int
    input_size: int
    output_size: int
    hidden_size: int
    n_layers: int

    def setup(self):
        self.emb = nn.Sequential(
            [nn.Dense(self.hidden_size), nn.LayerNorm(), lambda x: nn.leaky_relu(x, 0.2)]
        )
        self.z2init = nn.Dense(self.hidden_size * self.n_layers)
        self.grus = [nn.GRUCell(features=self.hidden_size) for _ in range(self.n_layers)]
        self.output = nn.Sequential(
            [nn.Dense(self.hidden_size), nn.LayerNorm(),
             lambda x: nn.leaky_relu(x, 0.2), nn.Dense(self.output_size)]
        )
        self.pe = positional_encoding_table(self.hidden_size)

    def get_init_hidden(self, latent):
        hidden = self.z2init(latent)
        return list(jnp.split(hidden, self.n_layers, axis=-1))

    def __call__(self, inputs, hidden, p):
        h_in = self.emb(inputs) + jax.lax.stop_gradient(self.pe[p])
        new_hidden = []
        for i in range(self.n_layers):
            h_i, _ = self.grus[i](hidden[i], h_in)
            new_hidden.append(h_i)
            h_in = h_i
        return self.output(h_in), new_hidden


class TextDecoder(nn.Module):
    """VAE text decoder head (ref: evaluator_models.py:187-230)."""

    text_size: int
    input_size: int
    output_size: int
    hidden_size: int
    n_layers: int

    def setup(self):
        self.emb = nn.Sequential(
            [nn.Dense(self.hidden_size), nn.LayerNorm(), lambda x: nn.leaky_relu(x, 0.2)]
        )
        self.z2init = nn.Dense(self.hidden_size * self.n_layers)
        self.grus = [nn.GRUCell(features=self.hidden_size) for _ in range(self.n_layers)]
        self.mu_net = nn.Dense(self.output_size)
        self.logvar_net = nn.Dense(self.output_size)
        self.pe = positional_encoding_table(self.hidden_size)

    def get_init_hidden(self, latent):
        hidden = self.z2init(latent)
        return list(jnp.split(hidden, self.n_layers, axis=-1))

    def __call__(self, inputs, hidden, p, rng):
        x_in = self.emb(inputs) + jax.lax.stop_gradient(self.pe[p])
        new_hidden = []
        for i in range(self.n_layers):
            h_i, _ = self.grus[i](hidden[i], x_in)
            new_hidden.append(h_i)
            x_in = h_i
        mu = self.mu_net(x_in)
        logvar = self.logvar_net(x_in)
        z = reparameterize(rng, mu, logvar)
        return z, mu, logvar, new_hidden
