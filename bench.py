"""Headline benchmark: batched diffusion sampling throughput on one chip.

Measures the flagship interaction model (8 layers, d=512, T=91, batch 64
pairs) running the full 1000-step DDPM ancestral sampler as one fused
lax.scan, and reports sampled motion frames/sec/chip.

``vs_baseline`` is measured, not quoted: the same model and shapes driven
the way the reference drives them — a host-synced per-step Python sampling
loop (gaussian_diffusion.py:747-769 semantics) on this same chip — is timed
alongside, and the ratio reported. (The repo publishes no numbers to quote —
BASELINE.md.)

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from hig_tpu.diffusion import gaussian as g
    from hig_tpu.models.interaction_model import InteractionModel
    from hig_tpu.models.tokenizer import tokenize
    from hig_tpu.data.vocab import CLASSID2CAPS

    B, T, D = 64, 91, 263
    model = InteractionModel()
    x0 = jnp.zeros((B, 2, T, D), jnp.float32)
    t0_ = jnp.zeros((B,), jnp.int32)
    lengths = jnp.full((B,), T, jnp.int32)
    c1, c2 = CLASSID2CAPS[2]
    tokens = jnp.asarray(
        np.stack([np.stack([tokenize(c1)[0], tokenize(c2)[0]])] * B), jnp.int32
    )
    params = model.init(jax.random.key(0), x0, t0_, lengths, tokens)
    sched = g.make_schedule(g.linear_betas(1000))

    xf_proj, xf_out = model.apply(
        params, tokens, True, method=InteractionModel.encode_text
    )

    def denoiser(x, t):
        return model.apply(
            params, x, t, lengths, xf_proj, xf_out, True,
            method=InteractionModel.denoise,
        )

    shape = (B, 2, T, D)
    frames = B * 2 * (T - 1)

    # --- fused scan sampler (ours) -----------------------------------------
    fused = jax.jit(lambda rng: g.p_sample_loop(sched, denoiser, shape, rng))
    fused(jax.random.key(0)).block_until_ready()  # compile
    t0 = time.time()
    reps = 3
    for i in range(reps):
        fused(jax.random.key(i + 1)).block_until_ready()
    fused_time = (time.time() - t0) / reps
    fused_fps = frames / fused_time

    # --- reference-style host loop on the same chip ------------------------
    # one jitted p_sample step, driven from Python with a host sync per step
    # (how the reference's sampler executes), timed over 50 steps and scaled.
    @jax.jit
    def one_step(x, t_scalar, rng):
        t = jnp.full((B,), t_scalar, jnp.int32)
        eps = denoiser(x, t)
        mean, log_var, _ = g.p_mean_variance(sched, eps, x, t)
        z = jax.random.normal(rng, x.shape, x.dtype)
        nz = (t_scalar != 0).astype(x.dtype)
        return mean + nz * jnp.exp(0.5 * log_var) * z

    x = jax.random.normal(jax.random.key(0), shape)
    x = one_step(x, jnp.asarray(999), jax.random.key(1))
    x.block_until_ready()  # compile
    probe_steps = 50
    t0 = time.time()
    rng = jax.random.key(2)
    for i in range(probe_steps):
        rng, sub = jax.random.split(rng)
        x = one_step(x, jnp.asarray(999 - i), sub)
        float(x[0, 0, 0, 0])  # host sync each step, as the reference does
    loop_time = (time.time() - t0) / probe_steps * 1000
    loop_fps = frames / loop_time

    result = {
        "metric": "ddpm1000_sampling_throughput",
        "value": round(fused_fps, 1),
        "unit": "frames/sec/chip (batch 64 pairs, T=91, 1000 steps)",
        "vs_baseline": round(fused_fps / loop_fps, 2),
        "fused_seconds_per_batch": round(fused_time, 3),
        "baseline_note": "reference-style host-synced per-step loop, same model/chip",
        "baseline_fps": round(loop_fps, 1),
        "n_devices": len(jax.devices()),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()
