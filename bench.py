"""Headline benchmark: batched diffusion sampling throughput on one chip.

Measures the flagship interaction model (8 layers, d=512, T=91) running the
full 1000-step DDPM ancestral sampler as one fused lax.scan through the
production `make_sampler` path (text encoded once, per-layer text-KV state
hoisted out of the scan, optional bf16 params/compute), and reports sampled
motion frames/sec/chip.

``vs_baseline`` is measured, not quoted: the same model and shapes driven
the way the reference drives them — a host-synced per-step f32 sampling loop
(gaussian_diffusion.py:747-769 semantics; the reference trains/samples
without AMP) on this same chip — timed over a probe and scaled. (The repo
publishes no numbers to quote — BASELINE.md.)

Environment notes (see .claude/skills/verify/SKILL.md): params must be jit
*arguments* (closing over them embeds them as constants and overflows the
remote-compile request); timings use a true host readback as the sync
point because block_until_ready on this backend returns early.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _sync(x) -> float:
    """True synchronization: force a device→host readback."""
    return float(jnp.sum(jnp.asarray(x, jnp.float32)))


def _tpu_alive(timeout_s: int = 480) -> bool:
    """Probe device usability in a CHILD process with a hard timeout.

    Late round 3 the tunnel went fully down: device use (and sometimes the
    interpreter's own startup registration) hangs with no exception. A child
    probe bounds that risk so the benchmark always emits its one JSON line.
    """
    import subprocess

    try:
        proc = subprocess.run(
            [sys.executable, __file__, "--probe-tpu"],
            capture_output=True, text=True, timeout=timeout_s,
        )
        return proc.returncode == 0 and "TPU_OK" in proc.stdout
    except Exception:  # noqa: BLE001 — any failure means "not usable"
        return False


def probe_tpu():
    x = jnp.ones((128, 128))
    _sync(x @ x)
    print(f"TPU_OK {len(jax.devices())}")


def main():
    if not _tpu_alive():
        print(json.dumps({
            "metric": "batched_sampling_throughput",
            "value": 0.0,
            "unit": "frames/sec/chip",
            "vs_baseline": 0.0,
            "error": "TPU unusable: device probe did not complete within "
                     "480s (tunnel down or worker dead) — no measurement "
                     "possible this run; see prior BENCH_r*.json for the "
                     "last good numbers",
        }))
        return
    from hig_tpu.utils.cache import enable as enable_cache

    enable_cache()
    from hig_tpu.diffusion import gaussian as g
    from hig_tpu.models.interaction_model import InteractionModel
    from hig_tpu.models.tokenizer import tokenize
    from hig_tpu.data.vocab import CLASSID2CAPS
    from hig_tpu.train.trainer import make_sampler

    T, D = 91, 263
    model_f32 = InteractionModel()
    model_bf16 = InteractionModel(dtype=jnp.bfloat16)
    sched = g.make_schedule(g.linear_betas(1000))

    c1, c2 = CLASSID2CAPS[2]
    pair = np.stack([tokenize(c1)[0], tokenize(c2)[0]])

    def make_inputs(B):
        tokens = jnp.asarray(np.stack([pair] * B), jnp.int32)
        lengths = jnp.full((B,), T, jnp.int32)
        return tokens, lengths

    # init on host CPU (fast), then one bulk transfer to the chip. Under the
    # axon plugin the "cpu" backend sometimes fails to register (flaky,
    # observed round 5) — fall back to default-device init.
    tokens64, lengths64 = make_inputs(64)
    x0 = jnp.zeros((64, 2, T, D), jnp.float32)
    t0_ = jnp.zeros((64,), jnp.int32)

    def host_init(init_fn):
        args = (jax.random.key(0), x0, t0_, lengths64, tokens64)
        try:
            with jax.default_device(jax.devices("cpu")[0]):
                p = jax.jit(init_fn, backend="cpu")(*args)
        except RuntimeError:
            p = jax.jit(init_fn)(*args)
        return jax.device_put(p, jax.devices()[0])

    params = host_init(model_f32.init)

    reps = 3

    def time_sampler(model, B, sampler="ddpm", ddim_steps=50, params_=None,
                     **sampler_kw):
        tokens, lengths = make_inputs(B)
        fn = make_sampler(model, sched, T, D, sampler=sampler,
                          ddim_steps=ddim_steps, **sampler_kw)
        p = params if params_ is None else params_
        _sync(fn(p, tokens, lengths, jax.random.key(0)))  # compile
        t0 = time.time()
        for i in range(reps):
            _sync(fn(p, tokens, lengths, jax.random.key(i + 1)))
        per_batch = (time.time() - t0) / reps
        return B * 2 * (T - 1) / per_batch, per_batch

    results = {}
    results["f32_b64"], fused_time = time_sampler(model_f32, 64)
    results["bf16_b64"], _ = time_sampler(model_bf16, 64)
    results["ddim50_bf16_b64"], _ = time_sampler(model_bf16, 64, sampler="ddim")
    # opt-in fast-LN path (bf16 LayerNorm statistics): quality-validated on
    # the full five-metric eval (NOTES.md) but numerics-changing, so it is
    # reported alongside rather than as the headline.
    model_fastln = InteractionModel(dtype=jnp.bfloat16, fast_ln=True)
    results["ddim50_fastln_bf16_b64"], _ = time_sampler(model_fastln, 64, sampler="ddim")
    # Few-step operating points. Throughput is weight-independent, so these
    # are the speeds a distilled checkpoint serves at (quality evidence:
    # results/distill_run/ — progressive distillation down the full
    # 25/13/7/4/2/1 ladder, including the one-denoiser-call regime) and the
    # --sampler dpm training-free alternative's cost.
    results["ddim13_bf16_b64"], _ = time_sampler(model_bf16, 64, "ddim", 13)
    results["ddim7_bf16_b64"], _ = time_sampler(model_bf16, 64, "ddim", 7)
    results["dpm7_bf16_b64"], _ = time_sampler(model_bf16, 64, "dpm", 7)
    results["ddim2_bf16_b64"], _ = time_sampler(model_bf16, 64, "ddim", 2)
    results["ddim1_bf16_b64"], _ = time_sampler(model_bf16, 64, "ddim", 1)
    # --rms_norm twin: scale-only norm param tree, so it needs its own init.
    # Throughput is weight-independent; the quality half of the evidence is
    # the five-metric parity run in results/rms_run/. Targets the ~56
    # serialized norm reduce fusions the DDIM step is latency-bound on.
    model_rms = InteractionModel(dtype=jnp.bfloat16, rms_norm=True)
    params_rms = host_init(InteractionModel(rms_norm=True).init)
    results["ddim50_rms_bf16_b64"], _ = time_sampler(
        model_rms, 64, "ddim", params_=params_rms
    )
    # Both latency-wall levers stacked (RMSNorm halves each norm's reduction
    # work, fast_ln keeps the stats in bf16). Individually quality-validated
    # (results/rms_run/, NOTES.md fast_ln eval); the combined point is a
    # throughput probe for the recommended serving config.
    model_rms_fastln = InteractionModel(dtype=jnp.bfloat16, rms_norm=True,
                                        fast_ln=True)
    results["ddim50_rms_fastln_bf16_b64"], _ = time_sampler(
        model_rms_fastln, 64, "ddim", params_=params_rms
    )
    del params_rms
    # --guidance_scale 2 (classifier-free guidance): w != 1 evaluates the
    # denoiser TWICE per step (conditional + null), so the quality lever's
    # throughput price must be on record next to its quality evidence
    # (results/cfg_run/). Needs a cond_drop_prob model (null params); the
    # timing is weight-independent.
    model_cfg = InteractionModel(dtype=jnp.bfloat16, cond_drop_prob=0.1)
    params_cfg = host_init(InteractionModel(cond_drop_prob=0.1).init)
    results["ddim50_cfg_w2_bf16_b64"], _ = time_sampler(
        model_cfg, 64, "ddim", params_=params_cfg, guidance_scale=2.0
    )
    del params_cfg

    # --- reference-style host loop on the same chip (f32 — ref has no AMP) --
    # Measured BEFORE the large-batch child probes: B=256 kills the TPU
    # worker process itself (root-caused in round 2), and a parent holding a
    # connection to a dead worker can hang — everything needed for the
    # headline must be in hand before that risk is taken.
    B = 64
    model = model_f32
    tokens, lengths = make_inputs(B)
    shape = (B, 2, T, D)

    @jax.jit
    def encode(params, tokens):
        return model.apply(params, tokens, True, method=InteractionModel.encode_text)

    xf_proj, xf_out = encode(params, tokens)

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
    med_step = float(np.median(step_times))
    loop_time = med_step * 1000
    loop_fps = B * 2 * (T - 1) / loop_time
    # Equal-step-count disclosure: the same host-synced loop run as DDIM-50
    # (per-step cost is the same denoiser call + host sync; the sampler
    # arithmetic is noise next to it) — so vs_baseline at equal step counts
    # is also on record, not only the DDPM-1000-as-the-reference-ships ratio.
    ddim_loop_fps = B * 2 * (T - 1) / (med_step * 50)

    # Larger batches probed in a child process LAST: a failure there (B=256
    # kills the TPU worker — see ROOFLINE/NOTES) cannot take down the
    # headline numbers, which are already collected above.
    import subprocess

    for B_probe in (128, 256):
        proc = None
        try:
            proc = subprocess.run(
                [sys.executable, __file__, "--probe-batch", str(B_probe)],
                capture_output=True, text=True, timeout=1800,
            )
            line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""
            results[f"bf16_b{B_probe}"] = json.loads(line)["fps"]
        except subprocess.TimeoutExpired:
            results[f"bf16_b{B_probe}"] = "failed (timeout)"
        except Exception:  # noqa: BLE001 — probe outcomes are informational
            rc = proc.returncode if proc is not None else "unknown"
            results[f"bf16_b{B_probe}"] = f"failed (rc={rc})"

    ddpm = {k: v for k, v in results.items() if k.startswith(("f32", "bf16"))
            and isinstance(v, float)}
    best_key = max(ddpm, key=ddpm.get)
    best_ddpm_fps = ddpm[best_key]
    # Production sampler: DDIM-50 — metric-equivalent to DDPM-1000 on the
    # same checkpoint (Acc/FID/Consistency/Diversity all within the 95% CI
    # over 3 replications; ROOFLINE.md + results/ddpm_vs_ddim/). DDPM-1000
    # itself is roofline-capped at 2868 f/s (11.8x) on this chip
    # (799.7 GFLOP/step measured by XLA cost analysis — ROOFLINE.md).
    prod_fps = results.get("ddim50_bf16_b64", best_ddpm_fps)

    result = {
        "metric": "batched_sampling_throughput",
        "value": round(prod_fps, 1),
        "unit": "frames/sec/chip (T=91; production sampler: DDIM-50 bf16, "
                "metric-equivalent to DDPM-1000 — see ROOFLINE.md)",
        "vs_baseline": round(prod_fps / loop_fps, 2),
        "baseline_note": "reference-style host-synced per-step f32 loop, same model/chip",
        "baseline_fps": round(loop_fps, 1),
        "ddim50_hostloop_baseline_fps": round(ddim_loop_fps, 1),
        "ddim50_vs_equal_steps_baseline": round(prod_fps / ddim_loop_fps, 2),
        "ddpm1000_best_fps": round(best_ddpm_fps, 1),
        "ddpm1000_best_config": best_key,
        "ddpm1000_vs_baseline": round(best_ddpm_fps / loop_fps, 2),
        "ddpm1000_roofline_ceiling_fps": 2868,
        "f32_b64_seconds_per_batch": round(fused_time, 3),
        "configs_fps": {
            k: (round(v, 1) if isinstance(v, float) else v) for k, v in results.items()
        },
        "equivalence_evidence": "results/eqrun3_allfive/ (all 5 metrics incl. "
                                "nonzero MultiModality, 3 reps per sampler, "
                                "same ckpt; earlier points in results/ddpm_vs_ddim/)",
        "n_devices": len(jax.devices()),
    }
    print(json.dumps(result))


def probe_batch(B: int):
    """Child-process probe of one batch size; prints {"fps": N}."""
    from hig_tpu.utils.cache import enable as enable_cache

    enable_cache()
    from hig_tpu.diffusion import gaussian as g
    from hig_tpu.models.interaction_model import InteractionModel
    from hig_tpu.models.tokenizer import tokenize
    from hig_tpu.data.vocab import CLASSID2CAPS
    from hig_tpu.train.trainer import make_sampler

    T, D = 91, 263
    model = InteractionModel(dtype=jnp.bfloat16)
    sched = g.make_schedule(g.linear_betas(1000))
    c1, c2 = CLASSID2CAPS[2]
    pair = np.stack([tokenize(c1)[0], tokenize(c2)[0]])
    tokens = jnp.asarray(np.stack([pair] * B), jnp.int32)
    lengths = jnp.full((B,), T, jnp.int32)
    with jax.default_device(jax.devices("cpu")[0]):
        params = jax.jit(InteractionModel().init, backend="cpu")(
            jax.random.key(0),
            jnp.zeros((1, 2, T, D), jnp.float32), jnp.zeros((1,), jnp.int32),
            lengths[:1], tokens[:1],
        )
    params = jax.device_put(params, jax.devices()[0])
    fn = make_sampler(model, sched, T, D)
    _sync(fn(params, tokens, lengths, jax.random.key(0)))
    t0 = time.time()
    for i in range(3):
        _sync(fn(params, tokens, lengths, jax.random.key(i + 1)))
    fps = B * 2 * (T - 1) / ((time.time() - t0) / 3)
    print(json.dumps({"fps": round(fps, 1)}))


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)) or ".")
    if len(sys.argv) == 2 and sys.argv[1] == "--probe-tpu":
        probe_tpu()
    elif len(sys.argv) == 3 and sys.argv[1] == "--probe-batch":
        probe_batch(int(sys.argv[2]))
    else:
        main()
