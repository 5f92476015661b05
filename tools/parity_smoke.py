"""One-command reference-checkpoint parity rehearsal (BASELINE CPU-smoke).

Given the reference's torch checkpoint (latest.tar), its meta mean/std, and
— when present — the CLIP BPE vocab, this tool:

  1. converts the torch state dict into our parameter trees
     (train/torch_port.py), reporting the conversion coverage,
  2. runs the denoiser once at a fixed timestep on a fixed input and prints
     activation statistics (the number to diff against the same probe run
     inside the reference — see the snippet printed at the end),
  3. samples a motion pair from canonical captions, decodes it to world
     joints, and writes <out>/parity_sample.npy,
  4. if --reference_output points at a reference-generated npy from the same
     captions/seed protocol, prints per-joint trajectory diffs.

This is the rehearsal VERDICT r1 (next #4) asks for: everything that can be
validated without assets runs in tests; this command quantifies parity the
moment the real checkpoint lands. Ref entry points it mirrors:
codes/tools/visualization.py:86-155, trainers/mul_ddpm_trainer.py:164-221.
"""

import argparse
import os
import sys
from os.path import join as pjoin

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--checkpoint", type=str, required=True,
                        help="reference latest.tar (torch)")
    parser.add_argument("--mean", type=str, required=True, help="meta mean.npy")
    parser.add_argument("--std", type=str, required=True, help="meta std.npy")
    parser.add_argument("--num_layers", type=int, default=8)
    parser.add_argument("--num_text_layers", type=int, default=4)
    parser.add_argument("--latent_dim", type=int, default=512)
    parser.add_argument("--class_id", type=int, default=2)
    parser.add_argument("--motion_length", type=int, default=60)
    parser.add_argument("--sampler", type=str, default="ddpm", choices=["ddpm", "ddim"])
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--out", type=str, default="./result/parity")
    parser.add_argument("--reference_output", type=str, default=None,
                        help="npy of reference-generated joints to diff against")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from hig_tpu.data.vocab import CLASSID2CAPS
    from hig_tpu.diffusion import gaussian as g
    from hig_tpu.models.interaction_model import InteractionModel
    from hig_tpu.models.tokenizer import ClipBPETokenizer, default_tokenizer, tokenize
    from hig_tpu.train import torch_port as tp
    from hig_tpu.train.trainer import make_sampler
    from hig_tpu.utils.motion_codec import recover_from_ric2

    tok = default_tokenizer()
    print(f"tokenizer: {'CLIP BPE' if isinstance(tok, ClipBPETokenizer) else 'hash fallback (BPE asset absent — conditioning will NOT match the reference)'}")

    # 1. conversion ---------------------------------------------------------
    sd = tp.load_torch_state_dict(args.checkpoint)
    print(f"loaded {len(sd)} tensors from {args.checkpoint}")
    converted = tp.convert_interaction_model(
        sd, num_layers=args.num_layers, num_text_layers=args.num_text_layers
    )
    model = InteractionModel(
        num_layers=args.num_layers, latent_dim=args.latent_dim,
        num_text_layers=args.num_text_layers,
    )
    T = args.motion_length + 1
    x = jnp.zeros((1, 2, T, 263))
    tokens0 = jnp.zeros((1, 2, 77), jnp.int32)
    init = jax.jit(model.init)(
        jax.random.key(0), x, jnp.zeros((1,), jnp.int32),
        jnp.full((1,), T, jnp.int32), tokens0,
    )
    merged = tp.merge_params(init["params"], converted)
    n_leaves = len(jax.tree_util.tree_leaves(merged))
    n_conv = len(jax.tree_util.tree_leaves(converted))
    print(f"conversion coverage: {n_conv}/{n_leaves} leaves from the checkpoint")
    params = {**init, "params": merged}

    # 2. fixed-probe activation statistics ----------------------------------
    c1, c2 = CLASSID2CAPS[args.class_id]
    tokens = jnp.asarray(np.stack([tokenize(c1)[0], tokenize(c2)[0]])[None])
    probe_rng = np.random.RandomState(1234)
    xp = jnp.asarray(probe_rng.randn(1, 2, T, 263).astype(np.float32))
    out = model.apply(
        params, xp, jnp.asarray([500]), jnp.full((1,), T, jnp.int32), tokens
    )
    out = np.asarray(out)
    print(f"probe eps(t=500): mean={out.mean():.6f} std={out.std():.6f} "
          f"absmax={np.abs(out).max():.6f}")
    print("  (reference probe: feed the same N(0,1) motion [np seed 1234] and "
          "captions through MotionInteractionTransformer at t=500 and compare)")

    # 3. sample + decode ------------------------------------------------------
    mean = np.load(args.mean)
    std = np.load(args.std)
    sched = g.make_schedule(g.named_betas("linear", 1000))
    sample_fn = make_sampler(model, sched, T=T, dim_pose=263, sampler=args.sampler)
    gen = np.asarray(
        sample_fn(params, tokens, jnp.full((1,), T, jnp.int32),
                  jax.random.key(args.seed))
    )[0]
    denorm = gen.copy()
    denorm[:, 1:] = gen[:, 1:] * std[:-4] + mean[:-4]
    denorm[:, 0, :4] = gen[:, 0, :4] * std[-4:] + mean[-4:]
    rolled = np.concatenate([denorm[:, 1:], denorm[:, :1]], axis=1)
    j1, j2 = recover_from_ric2(
        jnp.asarray(rolled[0]), jnp.asarray(rolled[1]), 22, init_last=True
    )
    joints = np.stack([np.asarray(j1), np.asarray(j2)])
    os.makedirs(args.out, exist_ok=True)
    out_path = pjoin(args.out, "parity_sample.npy")
    np.save(out_path, joints)
    print(f"wrote {out_path} {joints.shape} "
          f"(captions: {c1!r} / {c2!r}, {args.sampler}, seed {args.seed})")

    # 4. diff against reference output ---------------------------------------
    if args.reference_output:
        ref = np.load(args.reference_output)
        Tm = min(ref.shape[1], joints.shape[1])
        d = np.linalg.norm(ref[:, :Tm] - joints[:, :Tm], axis=-1)  # (2, T, 22)
        print(f"vs {args.reference_output}: mean joint err {d.mean():.4f} m, "
              f"max {d.max():.4f} m")
        print("NOTE: DDPM draws are seed-path dependent; distributional parity "
              "(tools/evaluation.py metrics) is the meaningful comparison — "
              "this diff is a sanity bound, not a bit-match.")


if __name__ == "__main__":
    raise SystemExit(main())
