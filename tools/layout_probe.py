"""Layout-copy A/B harness for the DDIM scan body (ROOFLINE.md 19% slice).

The round-3 device trace attributed ~2.0 ms/step (19%) of the DDIM-50 step
to f32 {2,3,1,0}<->{3,2,1,0} layout copies of (64,2,91,512) intermediates —
XLA assigning T-minor layouts to the K time-softmax reductions and D-minor
to everything else. This harness, run on the real chip:

1. compiles the production DDIM-50 bf16 sampler and counts `copy`/
   `transpose` ops (by shape) in the compiled HLO, and
2. times baseline vs the LAZY_KNORM rewrite (attention.py — normalize
   after the T-contraction, mathematically exact),

printing one JSON line per variant so the winner (or the dead end) can be
recorded in ROOFLINE.md with numbers.

Usage:  python tools/layout_probe.py [--variant base|lazy] [--hlo]
"""

import argparse
import collections
import json
import re
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import _common  # noqa: F401  (sys.path setup)


def _sync(x) -> float:
    return float(jnp.sum(jnp.asarray(x, jnp.float32)))


def build_sampler(B=64, T=91, D=263, tiny=False, ddim_steps=50):
    from hig_tpu.diffusion import gaussian as g
    from hig_tpu.models.interaction_model import InteractionModel
    from hig_tpu.models.text_encoder import ClipTextConfig
    from hig_tpu.models.tokenizer import tokenize
    from hig_tpu.data.vocab import CLASSID2CAPS
    from hig_tpu.train.trainer import make_sampler

    if tiny:
        # CPU-runnable smoke configuration: proves the harness + HLO regex
        # work without the real chip (the production numbers still need TPU)
        model = InteractionModel(
            num_layers=2, latent_dim=32, ff_size=64, num_heads=4,
            num_text_layers=1, text_latent_dim=16, text_ff_size=32,
            text_num_heads=2,
            clip_config=ClipTextConfig(width=32, heads=4, layers=2),
            dtype=jnp.bfloat16,
        )
    else:
        model = InteractionModel(dtype=jnp.bfloat16)
    sched = g.make_schedule(g.linear_betas(1000))
    c1, c2 = CLASSID2CAPS[2]
    pair = np.stack([tokenize(c1)[0], tokenize(c2)[0]])
    tokens = jnp.asarray(np.stack([pair] * B), jnp.int32)
    lengths = jnp.full((B,), T, jnp.int32)
    # init params from the SAME model config (fp32 param init on host; the
    # sampler casts to the compute dtype once up front). Under the axon
    # plugin the host "cpu" backend sometimes fails to register (observed
    # round 5: bench.py's identical call worked minutes earlier in another
    # process) — fall back to initializing on the default device.
    init_args = (
        jax.random.key(0),
        jnp.zeros((1, 2, T, D), jnp.float32), jnp.zeros((1,), jnp.int32),
        lengths[:1], tokens[:1],
    )
    try:
        with jax.default_device(jax.devices("cpu")[0]):
            params = jax.jit(model.init, backend="cpu")(*init_args)
    except RuntimeError:
        params = jax.jit(model.init)(*init_args)
    params = jax.device_put(params, jax.devices()[0])
    fn = make_sampler(model, sched, T, D, sampler="ddim",
                      ddim_steps=ddim_steps)
    return fn, params, tokens, lengths


def count_copy_ops(hlo_text: str) -> dict:
    """Histogram `copy`/`transpose` ops by result shape in HLO text (the
    {…} layout-assignment suffix is stripped so keys aggregate per shape)."""
    counts = collections.Counter()
    for line in hlo_text.splitlines():
        m = re.search(r"=\s*(\S+)\s+(copy|transpose)\(", line)
        if m:
            shape = re.sub(r"\{[^}]*\}$", "", m.group(1))
            counts[f"{m.group(2)} {shape}"] += 1
    return dict(counts.most_common(12))


def copy_stats(fn, params, tokens, lengths):
    """Count copy/transpose ops by result shape in the compiled HLO."""
    lowered = jax.jit(lambda p, c, l, r: fn(p, c, l, r)).lower(
        params, tokens, lengths, jax.random.key(0)
    )
    txt = lowered.compile().as_text()
    return count_copy_ops(txt), txt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="base", choices=["base", "lazy"])
    ap.add_argument("--hlo", action="store_true",
                    help="dump compiled HLO to /tmp/layout_{variant}.hlo")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--tiny", action="store_true",
                    help="2-layer d=32 model, B=2 T=25 DDIM-4 — CPU-backend "
                         "smoke of the harness itself, not a perf probe")
    args = ap.parse_args()

    from hig_tpu.models import attention

    attention.LAZY_KNORM = args.variant == "lazy"

    if args.tiny:
        B, T = 2, 25
        fn, params, tokens, lengths = build_sampler(
            B=B, T=T, tiny=True, ddim_steps=4)
    else:
        B, T = 64, 91
        fn, params, tokens, lengths = build_sampler(B=B, T=T)

    stats = {}
    if args.hlo:
        stats, txt = copy_stats(fn, params, tokens, lengths)
        open(f"/tmp/layout_{args.variant}.hlo", "w").write(txt)

    _sync(fn(params, tokens, lengths, jax.random.key(0)))  # compile
    t0 = time.time()
    for i in range(args.reps):
        _sync(fn(params, tokens, lengths, jax.random.key(i + 1)))
    per_batch = (time.time() - t0) / args.reps
    print(json.dumps({
        "variant": args.variant,
        "fps": round(B * 2 * (T - 1) / per_batch, 1),
        "seconds_per_batch": round(per_batch, 4),
        "copy_ops": stats,
    }))


if __name__ == "__main__":
    main()
