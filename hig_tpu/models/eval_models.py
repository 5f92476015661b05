"""Evaluator models: interaction classifier and mutual-consistency model.

Re-implementations of the reference's evaluation model zoo
(codes/models/interaction_transformer.py:641-828). Both consume the same
(B, 2, T, D) actor-explicit layout as the denoiser.

* :class:`MotionEncoder` — 8-layer post-LN transformer over the two actors'
  *concatenated* (2T) token sequence, masked mean pool of zero-init-projected
  outputs → 26-way classifier. Its pooled 512-d embedding feeds FID /
  Diversity / MultiModality.
* :class:`MotionConsistencyEvalModel` — same encoder with a CLS token →
  binary real-pair vs frankenstein-pair classifier ("Consistency" metric).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from hig_tpu.models.embeddings import length_mask
from hig_tpu.models.text_encoder import PostLNEncoderLayer


class _PairEmbedding(nn.Module):
    """Shared input embedding: init token via a 4-ch head, frames via a
    D-ch head + positional table. (ref: interaction_transformer.py:723-729)"""

    latent_dim: int
    num_frames: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # x: (B, 2, T, D_in)
        T = x.shape[2]
        seq_emb = self.param(
            "sequence_embedding",
            nn.initializers.normal(1.0),
            (self.num_frames, self.latent_dim),
        )
        move = nn.Dense(self.latent_dim, dtype=self.dtype, name="joint_embed1")(x[:, :, 1:])
        move = move + seq_emb[: T - 1].astype(self.dtype)
        init = nn.Dense(self.latent_dim, dtype=self.dtype, name="joint_embed2")(x[:, :, 0, :4])
        return jnp.concatenate([init[:, :, None, :], move], axis=2)


class MotionEncoder(nn.Module):
    """(ref: interaction_transformer.py:641-741)

    Returns (class logits (B, class_num), pooled embedding (B, latent_dim)).
    """

    input_feats: int = 259  # foot contacts dropped (train_evaluation_model.py:70)
    num_frames: int = 196
    latent_dim: int = 512
    ff_size: int = 1024
    num_layers: int = 8
    num_heads: int = 8
    class_num: int = 26
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, lengths: jax.Array, deterministic: bool = True):
        B, A, T, _ = x.shape
        h = _PairEmbedding(self.latent_dim, self.num_frames, self.dtype, name="embed")(x)
        tokens = h.reshape(B, A * T, self.latent_dim)
        mask = length_mask(lengths, T, self.dtype)
        mask2 = jnp.concatenate([mask, mask], axis=-1)  # (B, 2T)
        for i in range(self.num_layers):
            tokens = PostLNEncoderLayer(
                self.latent_dim, self.num_heads, self.ff_size, self.dropout, self.dtype,
                name=f"block_{i}",
            )(tokens, deterministic, key_mask=mask2)
        h = tokens.reshape(B, A, T, self.latent_dim)
        out1 = nn.Dense(
            self.latent_dim, kernel_init=nn.initializers.zeros, dtype=self.dtype, name="out1"
        )
        out2 = nn.Dense(
            self.latent_dim, kernel_init=nn.initializers.zeros, dtype=self.dtype, name="out2"
        )
        proj = jnp.concatenate([out2(h[:, :, :1]), out1(h[:, :, 1:])], axis=2)
        proj = proj.reshape(B, A * T, self.latent_dim)
        w = mask2[..., None]
        pooled = jnp.sum(proj * w, axis=1) / jnp.sum(w, axis=1)
        logits = nn.Dense(self.class_num, dtype=self.dtype, name="fin_proj")(pooled)
        return logits, pooled


class MotionConsistencyEvalModel(nn.Module):
    """(ref: interaction_transformer.py:743-828)

    Returns binary logits (B, 2): class 0 = genuine pair.
    """

    input_feats: int = 259
    num_frames: int = 196
    latent_dim: int = 512
    ff_size: int = 1024
    num_layers: int = 8
    num_heads: int = 8
    class_num: int = 2
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, lengths: jax.Array, deterministic: bool = True):
        B, A, T, _ = x.shape
        h = _PairEmbedding(self.latent_dim, self.num_frames, self.dtype, name="embed")(x)
        cls = self.param("cls_input", nn.initializers.normal(1.0), (1, 1, self.latent_dim))
        tokens = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(self.dtype), (B, 1, self.latent_dim)),
             h.reshape(B, A * T, self.latent_dim)],
            axis=1,
        )
        mask = length_mask(lengths, T, self.dtype)
        mask_full = jnp.concatenate(
            [jnp.ones((B, 1), self.dtype), mask, mask], axis=-1
        )
        for i in range(self.num_layers):
            tokens = PostLNEncoderLayer(
                self.latent_dim, self.num_heads, self.ff_size, self.dropout, self.dtype,
                name=f"block_{i}",
            )(tokens, deterministic, key_mask=mask_full)
        return nn.Dense(self.class_num, dtype=self.dtype, name="cls_output")(tokens[:, 0])
