"""Isolated full-size train-step timing: f32 vs bf16 on one chip.

Replaces the round-2 number (148.6 ms/step, NOTES.md) that was invalidated
by tunneled-worker degradation (the same script later measured ~900 ms
while sampler canaries were unaffected — NOTES.md:145-154). Methodology
matches that measurement: the FULL production train step (fwd+bwd+Adam+
clip via ``make_train_step``; frozen-tower text features precomputed, as
in ``Trainer.train``'s supervised path) on a device-resident synthetic
batch — no host data pipeline, so the number isolates the device program
the way ``bench.py`` isolates the sampler. Reference train loop being
compared: codes/trainers/mul_ddpm_trainer.py:249-256 (B=120/GPU, f32,
no AMP).

Prints one JSON line per dtype. Run a sampler canary (bench.py) in the
same session before trusting these — see .claude/skills/verify/SKILL.md.

Usage: python tools/step_probe.py [--batch 128] [--reps 10] [--dtypes f32,bf16]
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

import _common  # noqa: F401  (sys.path setup)


def _sync(x) -> float:
    return float(jnp.sum(jnp.asarray(x, jnp.float32)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128, help="pairs per step")
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--dtypes", default="f32,bf16")
    ap.add_argument("--tiny", action="store_true",
                    help="2-layer d=32 CPU smoke of the harness itself")
    args = ap.parse_args()

    import optax

    from hig_tpu.diffusion import gaussian as g
    from hig_tpu.models.interaction_model import InteractionModel
    from hig_tpu.models.text_encoder import ClipTextConfig
    from hig_tpu.train.trainer import make_train_step
    from hig_tpu.utils.cache import enable as enable_cache

    enable_cache()
    B, T, D = args.batch, 91, 263
    if args.tiny:
        B, T = 2, 25
    sched = g.make_schedule(g.linear_betas(1000))
    tx = optax.chain(optax.clip_by_global_norm(0.5), optax.adam(2e-4))

    for name in args.dtypes.split(","):
        dtype = {"f32": jnp.float32, "bf16": jnp.bfloat16}[name]
        if args.tiny:
            model = InteractionModel(
                num_layers=2, latent_dim=32, ff_size=64, num_heads=4,
                num_text_layers=1, text_latent_dim=16, text_ff_size=32,
                text_num_heads=2,
                clip_config=ClipTextConfig(width=32, heads=4, layers=2),
                dtype=dtype,
            )
        else:
            model = InteractionModel(dtype=dtype)
        W = model.clip_config.width

        rng = jax.random.key(0)
        batch = {
            "motion": jax.random.normal(rng, (B, 2, T, D), jnp.float32),
            "lengths": jnp.full((B,), T, jnp.int32),
            "tower_feats": jax.random.normal(rng, (B, 2, 77, W), jnp.float32),
            "tokens": jnp.ones((B, 2, 77), jnp.int32),
        }
        params = jax.jit(model.init)(
            rng, batch["motion"][:1], jnp.zeros((1,), jnp.int32),
            batch["lengths"][:1], batch["tokens"][:1],
        )
        from hig_tpu.train.trainer import TrainState

        state = TrainState(params=params, opt_state=tx.init(params),
                           step=jnp.zeros((), jnp.int32), ema_params=None)
        step = jax.jit(make_train_step(model, sched, tx, pit=False),
                       donate_argnums=(0,))

        t_c0 = time.time()
        state, metrics = step(state, batch, jax.random.key(1))
        _sync(metrics["loss_mot_rec"])
        compile_s = time.time() - t_c0
        t0 = time.time()
        for i in range(args.reps):
            state, metrics = step(state, batch, jax.random.key(i + 2))
        _sync(metrics["loss_mot_rec"])
        per_step = (time.time() - t0) / args.reps
        print(json.dumps({
            "dtype": name, "batch_pairs": B, "T": T,
            "ms_per_step": round(per_step * 1e3, 1),
            "pairs_per_sec": round(B / per_step, 1),
            "compile_s": round(compile_s, 1),
            "loss": round(float(metrics["loss_mot_rec"]), 4),
        }))


if __name__ == "__main__":
    main()
