"""Diffusion denoisers: the two-actor interaction model and the
single-person MotionDiffuse-style model.

TPU-first re-design of the reference models
(codes/models/interaction_transformer.py:397-616 and
codes/models/transformer.py:288-426). The key architectural change: the
reference couples the two actors by concatenating them on the *batch* axis
and slicing in every block; here actors are an explicit axis —
``x: (B, 2, T, D)`` — so the cross-actor swap is a ``jnp.flip`` and every
block is one batched einsum. This removes all the cat/split traffic, is
sharding-friendly (the actor axis can ride the model axis of a mesh), and
makes the PIT four-way duplication an explicit assignment axis in the
trainer instead of hidden batch layout.

Text encoding is deliberately *outside* the denoiser module: the sampler
encodes text once and closes over (xf_proj, xf_out) for all 1000/50 scan
steps (the reference re-used encoded text the same way at
mul_ddpm_trainer.py:187-197).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from hig_tpu.models.attention import (
    FFN,
    EfficientCrossAttention,
    EfficientInteractionAttention,
    EfficientSelfAttention,
    QuadraticCrossAttention,
    QuadraticInteractionAttention,
    QuadraticSelfAttention,
)
from hig_tpu.models.embeddings import TimeEmbedMLP, length_mask


class InteractionDenoiserLayer(nn.Module):
    """self-attn → text cross-attn → cross-actor interaction → FFN.

    (ref: LinearTemporalDiffusionTransformerDecoderLayer,
    interaction_transformer.py:334-367)
    """

    latent_dim: int
    text_latent_dim: int
    ff_size: int
    num_heads: int
    dropout: float = 0.0
    efficient: bool = True
    interaction: bool = True
    use_pallas: bool = False
    fused_blocks: bool = False
    causal: bool = False
    fast_ln: bool = False
    rms_norm: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        kw = dict(dropout=self.dropout, dtype=self.dtype)
        if self.efficient:
            self.sa_block = EfficientSelfAttention(
                self.latent_dim, self.num_heads, use_pallas=self.use_pallas,
                fused=self.fused_blocks, causal=self.causal,
                fast_ln=self.fast_ln, rms=self.rms_norm, **kw
            )
            self.ca_block = EfficientCrossAttention(
                self.latent_dim, self.text_latent_dim, self.num_heads,
                use_pallas=self.use_pallas, fast_ln=self.fast_ln,
                rms=self.rms_norm, **kw
            )
            if self.interaction:
                self.int_ca_block = EfficientInteractionAttention(
                    self.latent_dim, self.num_heads, use_pallas=self.use_pallas,
                    fused=self.fused_blocks, causal=self.causal,
                    fast_ln=self.fast_ln, rms=self.rms_norm, **kw
                )
        else:
            # the --no_eff compat path keeps flax's default f32 LN statistics
            self.sa_block = QuadraticSelfAttention(
                self.latent_dim, self.num_heads, causal=self.causal,
                use_pallas=self.use_pallas, **kw
            )
            self.ca_block = QuadraticCrossAttention(
                self.latent_dim, self.text_latent_dim, self.num_heads, **kw
            )
            if self.interaction:
                self.int_ca_block = QuadraticInteractionAttention(
                    self.latent_dim, self.num_heads, causal=self.causal,
                    use_pallas=self.use_pallas, **kw
                )
        self.ffn = FFN(self.latent_dim, self.ff_size,
                       fast_ln=self.fast_ln and self.efficient,
                       rms=self.rms_norm, **kw)

    def text_kv(self, xf_out):
        """This layer's loop-invariant text cross-attention state."""
        return self.ca_block.kv(xf_out)

    def __call__(self, x, xf_out, emb, src_mask, deterministic: bool = True,
                 text_kv=None, adaln=None):
        a = adaln or {}
        x = self.sa_block(x, emb, src_mask, deterministic, adaln=a.get("sa"))
        if text_kv is None:
            x = self.ca_block(x, xf_out, emb, deterministic, adaln=a.get("ca"))
        else:
            x = self.ca_block.from_kv(x, text_kv, emb, deterministic,
                                      adaln=a.get("ca"))
        if self.interaction:
            x = self.int_ca_block(x, emb, src_mask, deterministic,
                                  adaln=a.get("int"))
        return self.ffn(x, emb, deterministic, adaln=a.get("ffn"))


class InteractionDenoiser(nn.Module):
    """Two-actor text-conditioned denoiser.

    Inputs
      x          (B, 2, T, input_feats) — token 0 is the init-pose token
                 (only channels 0:4 meaningful, ref :593-601)
      timesteps  (B,) shared per pair (ref mul_ddpm_trainer.py:107-108)
      lengths    (B,) valid token count (incl. init token)
      xf_proj    (B, 2, time_embed_dim), xf_out (B, 2, L, text_latent_dim)

    Output: (B, 2, T, input_feats) — ε prediction; separate zero-init heads
    for the init token and the frames (ref :508-509,613-614).
    """

    input_feats: int = 263
    num_frames: int = 196
    latent_dim: int = 512
    ff_size: int = 1024
    num_layers: int = 8
    num_heads: int = 8
    text_latent_dim: int = 256
    dropout: float = 0.0
    efficient: bool = True
    interaction: bool = True
    use_pallas: bool = False
    fused_blocks: bool = False
    causal: bool = False
    single_transformer: bool = False
    fast_ln: bool = False
    rms_norm: bool = False
    dtype: jnp.dtype = jnp.float32

    @property
    def time_embed_dim(self) -> int:
        return self.latent_dim * 4

    def setup(self):
        if self.rms_norm and (not self.efficient or self.fused_blocks):
            # The --no_eff compat path keeps the reference's exact LayerNorm
            # stack, and the fused Pallas kernel computes LayerNorm
            # internally — neither supports RMSNorm. Refuse rather than
            # silently train one architecture and serve another.
            raise ValueError(
                "--rms_norm requires the efficient attention path and is "
                "incompatible with --fused_blocks"
            )
        if self.causal and self.single_transformer:
            # The merged-2T baseline concatenates the actors along the token
            # axis, so a causal mask over token index is NOT temporal
            # causality (actor 0 could never see actor 1; actor 1 would see
            # actor 0's whole future). Refuse rather than silently produce
            # wrong semantics.
            raise ValueError(
                "--causal cannot be combined with --single_transformer: the "
                "merged 2T timeline has no consistent temporal order. Use "
                "--causal with the interaction stack instead."
            )
        self.sequence_embedding = self.param(
            "sequence_embedding",
            nn.initializers.normal(1.0),
            (self.num_frames, self.latent_dim),
        )
        self.joint_embed = nn.Dense(self.latent_dim, dtype=self.dtype)
        self.joint_embed2 = nn.Dense(self.latent_dim, dtype=self.dtype)
        self.time_embed = TimeEmbedMLP(self.latent_dim, self.time_embed_dim, self.dtype)
        if self.single_transformer:
            # --single_transformer baseline: the reference defines
            # LinearTemporalBaselineDiffusionTransformerDecoderLayer
            # (interaction_transformer.py:618-639, sa → ca → ffn, no
            # interaction block) and parses the flag without consuming it
            # (base_options.py:21). Here the baseline is real: both actors
            # are merged into ONE 2T-token timeline processed by a single
            # transformer — self-attention couples the actors, text
            # cross-attention sees both captions' tokens.
            self.layers = [
                SinglePersonDenoiserLayer(
                    latent_dim=self.latent_dim,
                    text_latent_dim=self.text_latent_dim,
                    ff_size=self.ff_size,
                    num_heads=self.num_heads,
                    dropout=self.dropout,
                    efficient=self.efficient,
                    use_pallas=self.use_pallas,
                    causal=self.causal,
                    fast_ln=self.fast_ln,
                    rms_norm=self.rms_norm,
                    dtype=self.dtype,
                    name=f"layer_{i}",
                )
                for i in range(self.num_layers)
            ]
        else:
            self.layers = [
                InteractionDenoiserLayer(
                    latent_dim=self.latent_dim,
                    text_latent_dim=self.text_latent_dim,
                    ff_size=self.ff_size,
                    num_heads=self.num_heads,
                    dropout=self.dropout,
                    efficient=self.efficient,
                    interaction=self.interaction,
                    use_pallas=self.use_pallas,
                    fused_blocks=self.fused_blocks,
                    causal=self.causal,
                    fast_ln=self.fast_ln,
                    rms_norm=self.rms_norm,
                    dtype=self.dtype,
                    name=f"layer_{i}",
                )
                for i in range(self.num_layers)
            ]
        self.out = nn.Dense(
            self.input_feats, kernel_init=nn.initializers.zeros, dtype=self.dtype
        )
        self.out2 = nn.Dense(
            self.input_feats, kernel_init=nn.initializers.zeros, dtype=self.dtype
        )

    def text_kv(self, xf_out) -> tuple:
        """Per-layer loop-invariant text cross-attention state — compute once
        per sampling call, pass to :meth:`__call__` for every scan step."""
        if self.single_transformer and xf_out is not None:
            xf_out = self._merge_text(xf_out)
        return tuple(layer.text_kv(xf_out) for layer in self.layers)

    @staticmethod
    def _merge_text(xf_out: jax.Array) -> jax.Array:
        """(B, 2, L, Dt) → (B, 2L, Dt): both captions in one token sequence."""
        B = xf_out.shape[0]
        return xf_out.reshape((B, -1) + xf_out.shape[3:])

    # The three pieces around the layer stack, exposed separately so the
    # pipeline-parallel engine (parallel/pipeline.py) can run the stack
    # itself: embed_inputs → [layers] → project_out, with conditioning()
    # computed once. __call__ composes exactly these.

    def embed_inputs(self, x: jax.Array, lengths: jax.Array):
        """(B, 2, T, D_in) → (hidden (B, 2, T, D), src_mask (B, 1, T))."""
        B, A, T, _ = x.shape
        move = self.joint_embed(x[:, :, 1:]) + self.sequence_embedding[: T - 1].astype(
            self.dtype
        )
        init = self.joint_embed2(x[:, :, 0, :4])
        h = jnp.concatenate([init[:, :, None, :], move], axis=2)
        return h, length_mask(lengths, T, self.dtype)[:, None, :]

    def conditioning(self, timesteps: jax.Array, xf_proj: jax.Array) -> jax.Array:
        """(B,) timesteps + (B, 2, E) pooled text → per-block emb (B, 2, E)."""
        return self.time_embed(timesteps)[:, None, :] + xf_proj

    def project_out(self, h: jax.Array) -> jax.Array:
        """Hidden → ε prediction via the two zero-init output heads."""
        return jnp.concatenate(
            [self.out2(h[:, :, :1]), self.out(h[:, :, 1:])], axis=2
        )

    def __call__(
        self,
        x: jax.Array,
        timesteps: jax.Array,
        lengths: jax.Array,
        xf_proj: jax.Array,
        xf_out: jax.Array | None,
        deterministic: bool = True,
        text_kv: tuple | None = None,
        adaln: tuple | None = None,
    ) -> jax.Array:
        B, A, T, D_in = x.shape
        assert A == 2, "actor axis must be 2"

        h, src_mask = self.embed_inputs(x, lengths)  # mask: (B, 1, T)

        # ``adaln``: per-layer dicts of precomputed StylizationBlock
        # (scale, shift) pairs (adaln_scale_shift_grid in train/trainer.py) —
        # a sampling scan hoists the whole time-embed + AdaLN projection
        # stack out of the loop; emb is then only needed by blocks that did
        # not receive a precomputed pair.
        if adaln is None:
            emb = self.conditioning(timesteps, xf_proj)
        else:
            emb = None

        if self.single_transformer:
            # one 2T-token timeline; per-sequence conditioning is the mean of
            # the two actors' pooled text embeddings (symmetric in the actors)
            h = h.reshape(B, A * T, -1)
            if emb is not None:
                emb = jnp.mean(emb, axis=1)
            merged_mask = jnp.broadcast_to(src_mask, (B, A, T)).reshape(B, A * T)
            xf_merged = None if xf_out is None else self._merge_text(xf_out)
            for i, layer in enumerate(self.layers):
                h = layer(
                    h, xf_merged, emb, merged_mask, deterministic,
                    text_kv=None if text_kv is None else text_kv[i],
                    adaln=None if adaln is None else adaln[i],
                )
            h = h.reshape(B, A, T, -1)
        else:
            for i, layer in enumerate(self.layers):
                h = layer(
                    h, xf_out, emb, src_mask, deterministic,
                    text_kv=None if text_kv is None else text_kv[i],
                    adaln=None if adaln is None else adaln[i],
                )

        return self.project_out(h)


class SinglePersonDenoiserLayer(nn.Module):
    """self-attn → text cross-attn → FFN (ref: transformer.py:247-285)."""

    latent_dim: int
    text_latent_dim: int
    ff_size: int
    num_heads: int
    dropout: float = 0.0
    efficient: bool = True
    use_pallas: bool = False
    causal: bool = False
    fast_ln: bool = False
    rms_norm: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        kw = dict(dropout=self.dropout, dtype=self.dtype)
        if self.efficient:
            self.sa_block = EfficientSelfAttention(
                self.latent_dim, self.num_heads, use_pallas=self.use_pallas,
                causal=self.causal, fast_ln=self.fast_ln, rms=self.rms_norm,
                **kw
            )
            self.ca_block = EfficientCrossAttention(
                self.latent_dim, self.text_latent_dim, self.num_heads,
                use_pallas=self.use_pallas, fast_ln=self.fast_ln,
                rms=self.rms_norm, **kw
            )
        else:
            self.sa_block = QuadraticSelfAttention(
                self.latent_dim, self.num_heads, causal=self.causal,
                use_pallas=self.use_pallas, **kw
            )
            self.ca_block = QuadraticCrossAttention(
                self.latent_dim, self.text_latent_dim, self.num_heads, **kw
            )
        self.ffn = FFN(self.latent_dim, self.ff_size,
                       fast_ln=self.fast_ln and self.efficient,
                       rms=self.rms_norm, **kw)

    def text_kv(self, xf_out):
        return self.ca_block.kv(xf_out)

    def __call__(self, x, xf_out, emb, src_mask, deterministic: bool = True,
                 text_kv=None, adaln=None):
        a = adaln or {}
        x = self.sa_block(x, emb, src_mask, deterministic, adaln=a.get("sa"))
        if text_kv is None:
            x = self.ca_block(x, xf_out, emb, deterministic, adaln=a.get("ca"))
        else:
            x = self.ca_block.from_kv(x, text_kv, emb, deterministic,
                                      adaln=a.get("ca"))
        return self.ffn(x, emb, deterministic, adaln=a.get("ffn"))


class MotionDenoiser(nn.Module):
    """Single-person MotionDiffuse-style denoiser (ref: transformer.py:288-426).

    x: (B, T, input_feats); no init token, single output head.
    """

    input_feats: int = 263
    num_frames: int = 196
    latent_dim: int = 512
    ff_size: int = 1024
    num_layers: int = 8
    num_heads: int = 8
    text_latent_dim: int = 256
    dropout: float = 0.0
    efficient: bool = True
    use_pallas: bool = False
    dtype: jnp.dtype = jnp.float32

    @property
    def time_embed_dim(self) -> int:
        return self.latent_dim * 4

    def setup(self):
        self.sequence_embedding = self.param(
            "sequence_embedding",
            nn.initializers.normal(1.0),
            (self.num_frames, self.latent_dim),
        )
        self.joint_embed = nn.Dense(self.latent_dim, dtype=self.dtype)
        self.time_embed = TimeEmbedMLP(self.latent_dim, self.time_embed_dim, self.dtype)
        self.layers = [
            SinglePersonDenoiserLayer(
                latent_dim=self.latent_dim,
                text_latent_dim=self.text_latent_dim,
                ff_size=self.ff_size,
                num_heads=self.num_heads,
                dropout=self.dropout,
                efficient=self.efficient,
                use_pallas=self.use_pallas,
                dtype=self.dtype,
                name=f"layer_{i}",
            )
            for i in range(self.num_layers)
        ]
        self.out = nn.Dense(
            self.input_feats, kernel_init=nn.initializers.zeros, dtype=self.dtype
        )

    def text_kv(self, xf_out) -> tuple:
        return tuple(layer.text_kv(xf_out) for layer in self.layers)

    def __call__(
        self,
        x: jax.Array,
        timesteps: jax.Array,
        lengths: jax.Array,
        xf_proj: jax.Array,
        xf_out: jax.Array | None,
        deterministic: bool = True,
        text_kv: tuple | None = None,
    ) -> jax.Array:
        B, T, _ = x.shape
        h = self.joint_embed(x) + self.sequence_embedding[:T].astype(self.dtype)
        emb = self.time_embed(timesteps) + xf_proj
        src_mask = length_mask(lengths, T, self.dtype)
        for i, layer in enumerate(self.layers):
            h = layer(
                h, xf_out, emb, src_mask, deterministic,
                text_kv=None if text_kv is None else text_kv[i],
            )
        return self.out(h)
