"""Shared embedding / conditioning blocks for the denoisers.

Flax re-implementations of the reference's conditioning machinery
(codes/models/interaction_transformer.py:26-97): sinusoidal timestep
embeddings and the AdaLN-style StylizationBlock gate that injects
(timestep + text) conditioning after every attention/FFN block.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn


def timestep_embedding(timesteps: jax.Array, dim: int, max_period: int = 10000) -> jax.Array:
    """Sinusoidal embeddings, cos-first like the reference.

    (ref: interaction_transformer.py:26-43)
    """
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = timesteps.astype(jnp.float32)[..., None] * freqs
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[..., :1])], axis=-1)
    return emb


class TimeEmbedMLP(nn.Module):
    """latent_dim sinusoid → SiLU MLP → time_embed_dim.

    (ref: interaction_transformer.py:474-478)
    """

    latent_dim: int
    time_embed_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, timesteps: jax.Array) -> jax.Array:
        h = timestep_embedding(timesteps, self.latent_dim)
        h = nn.Dense(self.time_embed_dim, dtype=self.dtype, name="fc1")(h)
        h = nn.silu(h)
        return nn.Dense(self.time_embed_dim, dtype=self.dtype, name="fc2")(h)


def make_layer_norm(dtype, fast_ln: bool = False, name: str | None = None,
                    rms: bool = False):
    """LayerNorm whose statistics stay in the compute dtype when ``fast_ln``.

    flax promotes LN mean/variance to f32 by default; in a bf16 graph that
    materializes f32 intermediates around every norm — on the v5e device
    trace of the DDIM-50 scan body these convert+reduce fusions and the f32
    layout copies they force are ~40% of the step. ``fast_ln`` keeps the
    reductions in bf16 (opt-in: it changes numerics; quality-validated via
    the full five-metric eval, see NOTES.md).

    ``rms``: RMSNorm instead of LayerNorm (--rms_norm, a training-time
    architecture choice): drops the mean subtraction and the bias, halving
    the reduction work of each norm. The DDIM-50 scan body is latency-bound
    on ~56 serialized norm/softmax reduce fusions (ROOFLINE.md), so this is
    the trainable lever on that wall. Scale-only parameter tree — not
    checkpoint-compatible with LayerNorm models."""
    cls = nn.RMSNorm if rms else nn.LayerNorm
    return cls(dtype=dtype, force_float32_reductions=not fast_ln, name=name)


class StylizationBlock(nn.Module):
    """AdaLN gate: h ← out(SiLU(norm(h)·(1+scale)+shift)), zero-init output.

    (ref: interaction_transformer.py:71-97)

    The (scale, shift) half only depends on the conditioning ``emb`` — for a
    sampling scan whose timestep grid is known up front, :meth:`scale_shift`
    can be evaluated for EVERY step in one batched call outside the loop
    (see InteractionDenoiser.adaln_grid), so the per-step body skips the
    SiLU + (E, 2D) projection and stops streaming those weights from HBM
    every step. :meth:`from_scale_shift` is the per-step remainder; the
    composition is bitwise identical to :meth:`__call__`.
    """

    latent_dim: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    fast_ln: bool = False
    rms: bool = False

    def setup(self):
        # attribute names become the param-tree names — identical to the
        # previous nn.compact layout (emb/norm/out), so checkpoints swap.
        self.emb = nn.Dense(2 * self.latent_dim, dtype=self.dtype)
        self.norm = make_layer_norm(self.dtype, self.fast_ln, rms=self.rms)
        self.out = nn.Dense(
            self.latent_dim, kernel_init=nn.initializers.zeros, dtype=self.dtype
        )
        self.drop = nn.Dropout(self.dropout)

    def scale_shift(self, emb: jax.Array) -> tuple:
        """emb (..., E) → (scale, shift), each (..., 1, latent_dim)."""
        emb_out = self.emb(nn.silu(emb))
        scale, shift = jnp.split(emb_out[..., None, :], 2, axis=-1)
        return scale, shift

    def from_scale_shift(self, h, scale, shift, deterministic: bool = True):
        h = self.norm(h) * (1 + scale) + shift
        h = nn.silu(h)
        h = self.drop(h, deterministic=deterministic)
        return self.out(h)

    def __call__(self, h: jax.Array, emb: jax.Array, deterministic: bool = True) -> jax.Array:
        # emb: (..., E) broadcast over the time axis of h (..., T, D).
        scale, shift = self.scale_shift(emb)
        return self.from_scale_shift(h, scale, shift, deterministic)


def length_mask(lengths: jax.Array, T: int, dtype=jnp.float32) -> jax.Array:
    """(B,) valid lengths → (B, T) 0/1 mask.

    Vectorized replacement for the reference's per-element Python double loop
    (interaction_transformer.py:568-575), which ran every training step.
    """
    return (jnp.arange(T) < lengths[..., None]).astype(dtype)
