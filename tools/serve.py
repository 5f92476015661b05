"""Batch serving: captions file → sampled motions (→ optional SMPL fit).

The production-serving path (BASELINE.md config 5): reads caption-pair
requests, samples motions in fixed-shape device batches (sharded over the
mesh's data axis when more than one device is present), decodes to
world-frame joints, and optionally runs the vmapped SMPLify fit — all
without leaving the device between stages.

Request file: one JSON object per line:
  {"caption1": "...", "caption2": "...", "length": 60, "id": "req0"}
(id and length optional; length defaults to --motion_length.)

Outputs per request: <out_dir>/<id>.npz with features (2, T, 263) and
joints (2, T-1, 22, 3); plus an index.json.
"""

import argparse
import json
import os
import time
from os.path import join as pjoin

import jax
import jax.numpy as jnp
import numpy as np

from _common import load_stats, restore_trainer_state  # noqa: E402

from hig_tpu.config import load_opt_txt
from hig_tpu.models.tokenizer import tokenize
from hig_tpu.parallel import mesh as pmesh
from hig_tpu.train.trainer import eval_params, make_sampler
from hig_tpu.utils.motion_codec import recover_from_ric2


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--opt_path", type=str, required=True)
    parser.add_argument("--which_epoch", type=str, default="latest")
    parser.add_argument("--requests", type=str, required=True,
                        help="jsonl of caption-pair requests")
    parser.add_argument("--out_dir", type=str, default="./result/serve")
    parser.add_argument("--batch_size", type=int, default=256)
    parser.add_argument("--motion_length", type=int, default=60)
    parser.add_argument("--sampler", type=str, default=None,
                        choices=[None, "ddpm", "ddim", "dpm"])
    parser.add_argument("--fit_smpl", action="store_true")
    parser.add_argument("--smpl_model", type=str, default=None)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--tp", action="store_true",
                        help="serve with tensor-parallel (Megatron-sharded) "
                        "weights on the mesh's model axis")
    parser.add_argument("--mesh_model", type=int, default=0,
                        help="override the mesh's model-axis size (with --tp)")
    args = parser.parse_args()

    from hig_tpu.utils.cache import enable as enable_cache

    enable_cache()

    cfg = load_opt_txt(args.opt_path, is_train=False)
    if args.sampler:
        cfg.sampler = args.sampler
    if args.mesh_model:
        cfg.mesh.model = args.mesh_model
        cfg.mesh.data = -1
    if args.tp:
        cfg.tp, cfg.fsdp = True, False
    mean, std = load_stats(cfg, for_training=False)
    trainer, state, _, _ = restore_trainer_state(cfg, args.which_epoch)

    requests = []
    with open(args.requests) as f:
        for i, line in enumerate(f):
            line = line.strip()
            if not line:
                continue
            req = json.loads(line)
            req.setdefault("id", f"req{i}")
            req.setdefault("length", args.motion_length)
            requests.append(req)
    print(f"{len(requests)} requests")

    T = max(r["length"] for r in requests) + 1  # + init token
    sample_fn = make_sampler(
        trainer.model, trainer.sched, T=T, dim_pose=cfg.dim_pose,
        sampler=cfg.sampler, ddim_steps=cfg.ddim_steps,
        unroll=getattr(cfg, 'sampler_unroll', 1),
        guidance_scale=getattr(cfg, 'guidance_scale', 1.0),
    )
    mesh = trainer.mesh
    use_mesh = mesh.devices.size > 1
    params = eval_params(state)
    if use_mesh and not trainer.tp:
        # --tp leaves the Megatron-sharded placement from place_state in
        # effect (sampler output parity pinned by tests/test_parallel_tp.py)
        params = jax.device_put(params, pmesh.replicated(mesh))

    os.makedirs(args.out_dir, exist_ok=True)
    index = []
    rng = jax.random.key(args.seed)
    t_start = time.time()
    frames_done = 0
    for lo in range(0, len(requests), args.batch_size):
        chunk = requests[lo : lo + args.batch_size]
        pad = 0
        if use_mesh:
            per = mesh.devices.shape[0]
            pad = (-len(chunk)) % per
        chunk_p = chunk + [chunk[-1]] * pad
        if cfg.cap_id:
            from hig_tpu.data.vocab import CAP2KEY

            tokens = np.asarray(
                [[CAP2KEY[r["caption1"]], CAP2KEY[r["caption2"]]] for r in chunk_p],
                np.int32,
            )
        else:
            tokens = np.stack(
                [np.stack([tokenize(r["caption1"])[0], tokenize(r["caption2"])[0]])
                 for r in chunk_p]
            ).astype(np.int32)
        lengths = np.asarray([r["length"] + 1 for r in chunk_p], np.int32)
        if use_mesh:
            tokens = jax.device_put(tokens, pmesh.batch_sharding(mesh))
            lengths = jax.device_put(lengths, pmesh.batch_sharding(mesh))
        else:
            tokens, lengths = jnp.asarray(tokens), jnp.asarray(lengths)
        rng, sub = jax.random.split(rng)
        out = np.asarray(sample_fn(params, tokens, lengths, sub))
        out = out[: len(chunk)]

        # de-normalize + decode to joints (host numpy + one vmapped decode)
        denorm = out.copy()
        denorm[..., 1:, :] = out[..., 1:, :] * std[:-4] + mean[:-4]
        denorm[..., 0, :4] = out[..., 0, :4] * std[-4:] + mean[-4:]
        rolled = np.concatenate([denorm[:, :, 1:], denorm[:, :, :1]], axis=2)
        j1, j2 = recover_from_ric2(
            jnp.asarray(rolled[:, 0]), jnp.asarray(rolled[:, 1]),
            cfg.joints_num, init_last=True,
        )
        joints = np.stack([np.asarray(j1), np.asarray(j2)], axis=1)  # (B, 2, T-1, J, 3)

        for i, req in enumerate(chunk):
            L = req["length"]
            path = pjoin(args.out_dir, f"{req['id']}.npz")
            np.savez(path, features=denorm[i, :, : L + 1], joints=joints[i, :, :L])
            index.append({"id": req["id"], "path": path, "length": L})
        frames_done += sum(r["length"] * 2 for r in chunk)
        print(f"[{time.time()-t_start:.1f}s] {lo + len(chunk)}/{len(requests)} "
              f"({frames_done/(time.time()-t_start):.0f} frames/s)")

    if args.fit_smpl:
        _fit_smpl(args, index)

    with open(pjoin(args.out_dir, "index.json"), "w") as f:
        json.dump(index, f)
    print(f"wrote {len(index)} results to {args.out_dir}")


def _fit_smpl(args, index):
    from hig_tpu.smpl.lbs import load_smpl_model, synthetic_smpl_model
    from hig_tpu.smpl.prior import load_gmm_prior, synthetic_gmm_prior
    from hig_tpu.smpl.smplify import SMPLify3D

    ref_assets = "/root/reference/codes/joints2smpl/smpl_models"
    if args.smpl_model and os.path.exists(args.smpl_model):
        model = load_smpl_model(args.smpl_model)
    else:
        print("WARNING: no SMPL asset — synthetic test model")
        model = synthetic_smpl_model()
    gmm = pjoin(ref_assets, "gmm_08.pkl")
    prior = load_gmm_prior(gmm) if os.path.exists(gmm) else synthetic_gmm_prior()
    fitter = SMPLify3D(model=model, prior=prior, num_iters=30)
    conf = np.ones(22, np.float32)
    conf[[7, 8, 10, 11]] = 1.5
    for entry in index:
        data = np.load(entry["path"])
        j = data["joints"]  # (2, T, 22, 3)
        N = j.shape[0] * j.shape[1]
        result = fitter(
            jnp.zeros((N, 72)), jnp.zeros((N, 10)),
            jnp.asarray(j.reshape(N, 22, 3)), jnp.asarray(conf),
        )
        np.savez(
            entry["path"].replace(".npz", "_smpl.npz"),
            pose=np.asarray(result.pose), betas=np.asarray(result.betas),
            cam_t=np.asarray(result.camera_translation),
        )
        entry["smpl"] = entry["path"].replace(".npz", "_smpl.npz")


if __name__ == "__main__":
    main()
