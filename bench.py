"""Headline benchmark: batched diffusion sampling throughput on one chip.

Measures the flagship interaction model (8 layers, d=512, T=91, batch 64
pairs) running the full 1000-step DDPM ancestral sampler as one fused
lax.scan, and reports sampled motion frames/sec/chip.

``vs_baseline`` is measured, not quoted: the same model and shapes driven
the way the reference drives them — a host-synced per-step sampling loop
(gaussian_diffusion.py:747-769 semantics) on this same chip — timed over a
50-step probe and scaled. (The repo publishes no numbers to quote —
BASELINE.md.)

Environment notes (see .claude/skills/verify/SKILL.md): params must be jit
*arguments* (closing over them embeds them as constants and overflows the
remote-compile request); timings use a true host readback as the sync
point because block_until_ready on this backend returns early.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _sync(x) -> float:
    """True synchronization: force a device→host readback."""
    return float(jnp.sum(x))


def main():
    from hig_tpu.utils.cache import enable as enable_cache

    enable_cache()
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
    # init on host CPU (fast), then one bulk transfer to the chip
    with jax.default_device(jax.devices("cpu")[0]):
        params = jax.jit(model.init, backend="cpu")(
            jax.random.key(0), x0, t0_, lengths, tokens
        )
    params = jax.device_put(params, jax.devices()[0])
    sched = g.make_schedule(g.linear_betas(1000))

    @jax.jit
    def encode(params, tokens):
        return model.apply(params, tokens, True, method=InteractionModel.encode_text)

    xf_proj, xf_out = encode(params, tokens)

    shape = (B, 2, T, D)
    frames = B * 2 * (T - 1)

    # --- fused scan sampler (ours) -----------------------------------------
    @jax.jit
    def fused(params, xf_proj, xf_out, rng):
        def denoiser(x, t):
            return model.apply(
                params, x, t, lengths, xf_proj, xf_out, True,
                method=InteractionModel.denoise,
            )

        return g.p_sample_loop(sched, denoiser, shape, rng)

    _sync(fused(params, xf_proj, xf_out, jax.random.key(0)))  # compile
    reps = 3
    t0 = time.time()
    for i in range(reps):
        _sync(fused(params, xf_proj, xf_out, jax.random.key(i + 1)))
    fused_time = (time.time() - t0) / reps
    fused_fps = frames / fused_time

    # --- DDIM-50 fast path (the sampler the reference implemented but never
    # wired up; quality-comparable fast sampling) ---------------------------
    @jax.jit
    def fused_ddim(params, xf_proj, xf_out, rng):
        def denoiser(x, t):
            return model.apply(
                params, x, t, lengths, xf_proj, xf_out, True,
                method=InteractionModel.denoise,
            )

        return g.ddim_sample_loop(sched, denoiser, shape, rng, num_steps=50)

    _sync(fused_ddim(params, xf_proj, xf_out, jax.random.key(0)))
    t0 = time.time()
    for i in range(reps):
        _sync(fused_ddim(params, xf_proj, xf_out, jax.random.key(i + 1)))
    ddim_fps = frames / ((time.time() - t0) / reps)

    # --- reference-style host loop on the same chip ------------------------
    @jax.jit
    def one_step(params, xf_proj, xf_out, x, t_scalar, rng):
        t = jnp.full((B,), t_scalar, jnp.int32)
        eps = model.apply(
            params, x, t, lengths, xf_proj, xf_out, True,
            method=InteractionModel.denoise,
        )
        mean, log_var, _ = g.p_mean_variance(sched, eps, x, t)
        z = jax.random.normal(rng, x.shape, x.dtype)
        nz = (t_scalar != 0).astype(x.dtype)
        return mean + nz * jnp.exp(0.5 * log_var) * z

    x = jax.random.normal(jax.random.key(0), shape)
    x = one_step(params, xf_proj, xf_out, x, jnp.asarray(999), jax.random.key(1))
    _sync(x)  # compile
    probe_steps = 60
    rng = jax.random.key(2)
    step_times = []
    for i in range(probe_steps):
        rng, sub = jax.random.split(rng)
        t0 = time.time()
        x = one_step(params, xf_proj, xf_out, x, jnp.asarray(999 - i), sub)
        float(x[0, 0, 0, 0])  # host sync each step, as the reference does
        step_times.append(time.time() - t0)
    # median per-step time × 1000 steps (tunnel sync latency is heavy-tailed)
    loop_time = float(np.median(step_times)) * 1000
    loop_fps = frames / loop_time

    result = {
        "metric": "ddpm1000_sampling_throughput",
        "value": round(fused_fps, 1),
        "unit": "frames/sec/chip (batch 64 pairs, T=91, 1000 steps)",
        "vs_baseline": round(fused_fps / loop_fps, 2),
        "fused_seconds_per_batch": round(fused_time, 3),
        "baseline_note": "reference-style host-synced per-step loop, same model/chip",
        "baseline_fps": round(loop_fps, 1),
        "ddim50_fps": round(ddim_fps, 1),
        "n_devices": len(jax.devices()),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()
