"""Timestep samplers for training (ref: gaussian_diffusion.py:16-160).

Pure-functional: samplers are (state, rng) → (t, weights, state). The
loss-aware second-moment resampler keeps its history in a fixed-shape array
so it jits cleanly; its cross-host synchronization is a ``jax.lax.pmean``
over the data axis instead of the reference's torch.distributed all_gather
(gaussian_diffusion.py:74-106).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


def uniform_sample(
    rng: jax.Array, batch: int, num_timesteps: int
) -> tuple[jax.Array, jax.Array]:
    """Uniform timestep sampler (the one used by the reference trainer,
    mul_ddpm_trainer.py:60). Returns (t, importance weights)."""
    t = jax.random.randint(rng, (batch,), 0, num_timesteps)
    weights = jnp.ones((batch,), jnp.float32)
    return t, weights


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class LossSecondMomentState:
    """History buffer for the loss-aware resampler.

    (ref: gaussian_diffusion.py:123-160; history_per_term=10)
    """

    losses: jax.Array  # (T, history)
    counts: jax.Array  # (T,)

    @classmethod
    def create(cls, num_timesteps: int, history_per_term: int = 10):
        return cls(
            losses=jnp.zeros((num_timesteps, history_per_term), jnp.float32),
            counts=jnp.zeros((num_timesteps,), jnp.int32),
        )


def loss_aware_weights(
    state: LossSecondMomentState, uniform_prob: float = 0.001
) -> jax.Array:
    """Per-timestep sampling distribution ∝ sqrt(E[loss²]), uniform until the
    history is warm. (ref: gaussian_diffusion.py:135-145)"""
    T, H = state.losses.shape
    warmed = jnp.all(state.counts == H)
    w = jnp.sqrt(jnp.mean(state.losses**2, axis=-1))
    w = w / jnp.maximum(jnp.sum(w), 1e-12)
    w = w * (1 - uniform_prob) + uniform_prob / T
    return jnp.where(warmed, w, jnp.full((T,), 1.0 / T))


def loss_aware_sample(
    rng: jax.Array, batch: int, state: LossSecondMomentState
) -> tuple[jax.Array, jax.Array]:
    p = loss_aware_weights(state)
    t = jax.random.choice(rng, p.shape[0], (batch,), p=p)
    weights = 1.0 / (p.shape[0] * p[t])
    return t, weights


def loss_aware_update(
    state: LossSecondMomentState,
    t: jax.Array,
    losses: jax.Array,
    axis_name: str | None = None,
) -> LossSecondMomentState:
    """Fold this step's per-sample losses into the history.

    With ``axis_name`` set (inside shard_map/pmap), averages the per-timestep
    contribution across hosts — the TPU-native stand-in for the reference's
    all_gather sync (gaussian_diffusion.py:74-106).
    """
    if axis_name is not None:
        losses = jax.lax.pmean(losses, axis_name)
    T, H = state.losses.shape

    def fold(carry, inp):
        losses_buf, counts = carry
        ti, li = inp
        row = losses_buf[ti]
        cnt = counts[ti]
        # shift-in once full, append otherwise
        shifted = jnp.concatenate([row[1:], jnp.array([li])])
        appended = row.at[jnp.minimum(cnt, H - 1)].set(li)
        new_row = jnp.where(cnt == H, shifted, appended)
        losses_buf = losses_buf.at[ti].set(new_row)
        counts = counts.at[ti].set(jnp.minimum(cnt + 1, H))
        return (losses_buf, counts), None

    (losses_buf, counts), _ = jax.lax.scan(
        fold, (state.losses, state.counts), (t, losses)
    )
    return LossSecondMomentState(losses=losses_buf, counts=counts)
