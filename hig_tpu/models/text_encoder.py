"""Text conditioning stack: frozen CLIP text tower + learnable suffix.

Re-implementation of the reference's text path
(codes/models/interaction_transformer.py:429-462,533-566):

  tokens → CLIP ViT-B/32 text transformer (frozen)        → (N, 77, 512)
         → text_pre_proj Linear(512→256)
         → 4-layer learnable post-LN transformer encoder   → xf_out
         → LayerNorm
         → pooled at the EOT position → Linear(→ time_embed_dim) = xf_proj

The CLIP tower is architecture-exact (pre-LN residual blocks, causal mask,
QuickGELU) so OpenAI checkpoint weights can be ported 1:1 with
:func:`hig_tpu.train.torch_port.convert_clip_text_tower`; "frozen" is
expressed as an optax mask over the ``clip`` parameter subtree instead of
requires_grad flags. The class-id conditioning mode used by PIT (a learned
43-row caption-embedding table, ref :431,561-566) lives here too.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class ClipTextConfig:
    """OpenAI CLIP ViT-B/32 text-tower hyperparameters."""

    vocab_size: int = 49408
    context_length: int = 77
    width: int = 512
    heads: int = 8
    layers: int = 12


def quick_gelu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(1.702 * x)


class ClipAttention(nn.Module):
    width: int
    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, causal: bool = True) -> jax.Array:
        N, L, D = x.shape
        H = self.heads
        qkv = nn.Dense(3 * D, dtype=self.dtype, name="in_proj")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(N, L, H, D // H)
        k = k.reshape(N, L, H, D // H)
        v = v.reshape(N, L, H, D // H)
        scale = 1.0 / jnp.sqrt(jnp.asarray(D // H, q.dtype))
        logits = jnp.einsum("nqhd,nkhd->nhqk", q, k) * scale
        if causal:
            mask = jnp.tril(jnp.ones((L, L), bool))
            logits = jnp.where(mask, logits, jnp.asarray(-jnp.inf, logits.dtype))
        w = jax.nn.softmax(logits, axis=-1)
        y = jnp.einsum("nhqk,nkhd->nqhd", w, v).reshape(N, L, D)
        return nn.Dense(D, dtype=self.dtype, name="out_proj")(y)


class ClipResidualBlock(nn.Module):
    """Pre-LN residual attention block with QuickGELU MLP (CLIP convention)."""

    width: int
    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = x + ClipAttention(self.width, self.heads, self.dtype, name="attn")(
            nn.LayerNorm(dtype=self.dtype, name="ln_1")(x)
        )
        h = nn.LayerNorm(dtype=self.dtype, name="ln_2")(x)
        h = nn.Dense(4 * self.width, dtype=self.dtype, name="mlp_fc")(h)
        h = quick_gelu(h)
        return x + nn.Dense(self.width, dtype=self.dtype, name="mlp_proj")(h)


class ClipTextTower(nn.Module):
    """Token ids (N, 77) → final-LN token features (N, 77, width).

    Matches the slice of CLIP the reference uses (no text_projection, no
    visual tower — ref interaction_transformer.py:533-550).
    """

    config: ClipTextConfig = ClipTextConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: jax.Array) -> jax.Array:
        cfg = self.config
        tok_emb = self.param(
            "token_embedding",
            nn.initializers.normal(0.02),
            (cfg.vocab_size, cfg.width),
        )
        pos_emb = self.param(
            "positional_embedding",
            nn.initializers.normal(0.01),
            (cfg.context_length, cfg.width),
        )
        x = tok_emb[tokens].astype(self.dtype) + pos_emb.astype(self.dtype)
        for i in range(cfg.layers):
            x = ClipResidualBlock(cfg.width, cfg.heads, self.dtype, name=f"block_{i}")(x)
        return nn.LayerNorm(dtype=self.dtype, name="ln_final")(x)


class PostLNEncoderLayer(nn.Module):
    """torch nn.TransformerEncoderLayer (norm_first=False, gelu) equivalent.

    (the learnable text transformer, ref interaction_transformer.py:450-458)
    """

    d_model: int
    heads: int
    ff_size: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        deterministic: bool = True,
        key_mask: jax.Array | None = None,
    ) -> jax.Array:
        N, L, D = x.shape
        H = self.heads
        qkv = nn.Dense(3 * D, dtype=self.dtype, name="in_proj")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(N, L, H, D // H)
        k = k.reshape(N, L, H, D // H)
        v = v.reshape(N, L, H, D // H)
        scale = 1.0 / jnp.sqrt(jnp.asarray(D // H, q.dtype))
        logits = jnp.einsum("nqhd,nkhd->nhqk", q, k) * scale
        if key_mask is not None:
            # key_mask: (N, L) 1 = attend, 0 = pad (torch src_key_padding_mask
            # semantics, inverted)
            logits = jnp.where(
                key_mask[:, None, None, :].astype(bool),
                logits,
                jnp.asarray(-jnp.inf, logits.dtype),
            )
        w = jax.nn.softmax(logits, axis=-1)
        y = jnp.einsum("nhqk,nkhd->nqhd", w, v).reshape(N, L, D)
        y = nn.Dense(D, dtype=self.dtype, name="out_proj")(y)
        y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        x = nn.LayerNorm(dtype=self.dtype, name="norm1")(x + y)
        h = nn.Dense(self.ff_size, dtype=self.dtype, name="linear1")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(D, dtype=self.dtype, name="linear2")(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return nn.LayerNorm(dtype=self.dtype, name="norm2")(x + h)


class TextEncoder(nn.Module):
    """Full conditioning encoder: tokens → (xf_proj, xf_out).

    xf_proj: (N, time_embed_dim) pooled conditioning added to the timestep
    embedding; xf_out: (N, 77, text_latent_dim) token features for
    cross-attention. (ref: encode_text, interaction_transformer.py:533-559)

    The frozen CLIP tower and the learnable suffix are separable:
    :meth:`tower` output depends only on the caption, so training loops with
    a fixed caption vocabulary (NTU has 43 strings) precompute it once and
    call :meth:`from_tower` inside the train step — the reference re-ran the
    frozen CLIP tower every step.
    """

    clip_config: ClipTextConfig = ClipTextConfig()
    text_latent_dim: int = 256
    text_ff_size: int = 2048
    text_num_heads: int = 4
    num_text_layers: int = 4
    time_embed_dim: int = 2048
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.clip = ClipTextTower(self.clip_config, self.dtype)
        if self.text_latent_dim != self.clip_config.width:
            self.text_pre_proj = nn.Dense(self.text_latent_dim, dtype=self.dtype)
        self.text_blocks = [
            PostLNEncoderLayer(
                self.text_latent_dim,
                self.text_num_heads,
                self.text_ff_size,
                self.dropout,
                self.dtype,
            )
            for i in range(self.num_text_layers)
        ]
        self.text_ln = nn.LayerNorm(dtype=self.dtype)
        self.text_proj = nn.Dense(self.time_embed_dim, dtype=self.dtype)

    def tower(self, tokens: jax.Array) -> jax.Array:
        """Frozen CLIP features (N, 77, width) — cacheable per caption."""
        return jax.lax.stop_gradient(self.clip(tokens))

    def from_tower(
        self, tower_out: jax.Array, tokens: jax.Array, deterministic: bool = True
    ):
        """Learnable suffix: tower features + tokens → (xf_proj, xf_out)."""
        if self.text_latent_dim != self.clip_config.width:
            x = self.text_pre_proj(tower_out)
        else:
            x = tower_out
        for block in self.text_blocks:
            x = block(x, deterministic)
        xf_out = self.text_ln(x)
        eot = jnp.argmax(tokens, axis=-1)
        pooled = jnp.take_along_axis(xf_out, eot[:, None, None], axis=1)[:, 0]
        xf_proj = self.text_proj(pooled)
        return xf_proj, xf_out

    def __call__(self, tokens: jax.Array, deterministic: bool = True):
        return self.from_tower(self.tower(tokens), tokens, deterministic)


class ClassConditioner(nn.Module):
    """Caption-id conditioning for PIT (cap_id mode).

    A learned (43, text_latent_dim) caption table; xf_out is the single
    table row as a length-1 "token sequence".
    (ref: interaction_transformer.py:430-434,561-566)
    """

    num_captions: int = 43
    text_latent_dim: int = 256
    time_embed_dim: int = 2048
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, cap_ids: jax.Array):
        table = self.param(
            "cap_embedding",
            nn.initializers.normal(1.0),
            (self.num_captions, self.text_latent_dim),
        )
        emb = table[cap_ids].astype(self.dtype)
        xf_out = emb[:, None, :]
        xf_proj = nn.Dense(self.time_embed_dim, dtype=self.dtype, name="text_proj")(emb)
        return xf_proj, xf_out
