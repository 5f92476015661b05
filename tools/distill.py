"""Progressively distill a trained diffusion model to few-step DDIM sampling.

Beat-the-reference tool (Salimans & Ho, ICLR 2022): the reference pays 1000
sequential denoiser calls per sample (codes/models/gaussian_diffusion.py:
668-769); hig_tpu's production DDIM-50 path is already 20x fewer, and each
distillation stage halves that again at quality parity (validated with
tools/evaluation.py's five-metric harness on every stage's checkpoint).

Each stage N writes a full experiment directory
``{checkpoints_dir}/{dataset}/{name}_distill{N}/`` (opt.txt with
sampler=ddim ddim_steps=N, model/latest, meta/) — directly consumable by
tools/evaluation.py, tools/visualization.py and tools/serve.py.

Example (halving ladder 50 -> 25 -> 13 -> 7):
  python tools/distill.py --opt_path $CKPT/ntu_mul/interaction/opt.txt \
      --epochs_per_stage 6 --lr 5e-5
"""

import argparse
import dataclasses
import json
import os
import shutil
import time
from os.path import join as pjoin

import jax
import numpy as np

from _common import load_stats, restore_trainer_state  # noqa: E402

from hig_tpu.config import load_opt_txt, save_opt_txt
from hig_tpu.data.dataset import PairDataset, epoch_batches
from hig_tpu.diffusion import distill as pd
from hig_tpu.train import checkpoint as ckpt
from hig_tpu.train.trainer import Trainer, TrainState, eval_params


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--opt_path", type=str, required=True,
                        help="teacher experiment's opt.txt")
    parser.add_argument("--model_name", type=str, default="latest")
    parser.add_argument("--stages", type=str, default=None,
                        help="comma-separated student step counts (default: "
                             "halving ladder from the teacher's ddim_steps)")
    parser.add_argument("--min_steps", type=int, default=4,
                        help="stop the default halving ladder at this count")
    parser.add_argument("--epochs_per_stage", type=int, default=6)
    parser.add_argument("--lr", type=float, default=5e-5,
                        help="distillation lr (lower than training lr: the "
                             "student starts at the teacher's optimum)")
    parser.add_argument("--batch_size", type=int, default=None)
    parser.add_argument("--times", type=int, default=1,
                        help="epoch inflation for the distillation data pass")
    parser.add_argument("--log_every", type=int, default=None)
    parser.add_argument("--distill_w", type=float, default=1.0,
                        help="fixed-w guided distillation (CFG teacher only): "
                             "the teacher target is the guided blend "
                             "eps_u + w*(eps_c - eps_u); the student "
                             "internalizes the guidance and is sampled at "
                             "w=1 (one denoiser call per step)")
    args = parser.parse_args()

    cfg = load_opt_txt(args.opt_path, is_train=True)
    cfg.lr = args.lr
    cfg.is_continue = False
    if args.batch_size:
        cfg.batch_size = args.batch_size
    if args.log_every:
        cfg.log_every = args.log_every
    if cfg.sampler != "ddim":
        print(f"note: teacher opt.txt has sampler={cfg.sampler}; distillation "
              f"targets the DDIM grid (teacher steps = {cfg.ddim_steps})")

    stages = (
        [int(s) for s in args.stages.split(",")]
        if args.stages
        else pd.halving_stages(cfg.ddim_steps, args.min_steps)
    )
    print(f"distillation ladder: {cfg.ddim_steps} -> {stages}")

    mean, std = load_stats(cfg, for_training=False)
    dataset = PairDataset(
        cfg, mean, std, "train_sub.txt", times=args.times,
        label_path=cfg.label_path, seed=cfg.seed,
    )
    print(f"dataset: {dataset.real_len()} clips x times={args.times}")

    trainer, teacher_state, _, _ = restore_trainer_state(cfg, args.model_name)
    teacher_params = eval_params(teacher_state)
    model, sched = trainer.model, trainer.sched
    tower_feats = None
    if not cfg.cap_id and not cfg.no_clip:
        tower_feats, _ = trainer.precompute_tower(teacher_params)

    # student starts as a copy of the teacher (fresh Adam moments per stage)
    student_params = jax.tree_util.tree_map(jax.numpy.copy, teacher_params)
    base_rng = jax.random.key(cfg.seed + 3)
    it = 0

    for stage_idx, n_steps in enumerate(stages):
        # Snap teacher midpoints onto the teacher's own trained grid: the
        # stage-0 teacher knows all t, but every later teacher is a student
        # that was only supervised on its own DDIM grid (see distill_grids).
        prev_steps = cfg.ddim_steps if stage_idx == 0 else stages[stage_idx - 1]
        grids = pd.distill_grids(sched.num_timesteps, n_steps, teacher_steps=prev_steps)
        opt_state = trainer.tx.init(student_params)
        state = TrainState(
            params=student_params, opt_state=opt_state,
            step=jax.numpy.zeros((), jax.numpy.int32),
        )
        state = trainer.place_state(state)
        step_fn = jax.jit(
            pd.make_distill_step(model, sched, trainer.tx, grids,
                                 distill_w=args.distill_w),
            donate_argnums=(0,),
        )
        print(f"=== stage {stage_idx}: teacher DDIM-{prev_steps} -> "
              f"student DDIM-{n_steps} ===")
        start = time.time()
        logs: dict[str, float] = {}
        stage_cfg = dataclasses.replace(
            cfg, name=f"{cfg.name}_distill{n_steps}",
            sampler="ddim", ddim_steps=n_steps,
        )
        if args.distill_w != 1.0:
            # the student internalized w; its checkpoint samples UNGUIDED
            # (one denoiser call per step) — pin that in its opt.txt
            stage_cfg = dataclasses.replace(stage_cfg, guidance_scale=1.0)
        metrics_path = pjoin(stage_cfg.save_root, "metrics.jsonl")
        os.makedirs(stage_cfg.model_dir, exist_ok=True)
        os.makedirs(stage_cfg.meta_dir, exist_ok=True)
        for stat in ("mean.npy", "std.npy"):
            shutil.copyfile(pjoin(cfg.meta_dir, stat), pjoin(stage_cfg.meta_dir, stat))
        save_opt_txt(stage_cfg, pjoin(stage_cfg.save_root, "opt.txt"))

        for epoch in range(args.epochs_per_stage):
            for batch in epoch_batches(dataset, cfg.batch_size, epoch, seed=cfg.seed):
                rng = jax.random.fold_in(jax.random.fold_in(base_rng, it), stage_idx)
                dev_batch = trainer._device_batch(batch, tower_feats)
                state, metrics = step_fn(state, teacher_params, dev_batch, rng)
                metrics = {k: float(v) for k, v in metrics.items()}
                if not all(np.isfinite(v) for v in metrics.values()):
                    raise FloatingPointError(
                        f"non-finite distillation loss at stage {n_steps} "
                        f"it {it}: {metrics}"
                    )
                it += 1
                for k, v in metrics.items():
                    logs[k] = logs.get(k, 0.0) + v
                if it % cfg.log_every == 0:
                    mn = {k: v / cfg.log_every for k, v in logs.items()}
                    logs = {}
                    print(
                        f"stage {n_steps} epoch {epoch} it {it} "
                        + " ".join(f"{k}: {v:.5f}" for k, v in mn.items())
                        + f" ({time.time() - start:.0f}s)"
                    )
                    with open(metrics_path, "a") as f:
                        f.write(json.dumps({"stage": n_steps, "it": it,
                                            "epoch": epoch, **mn}) + "\n")

        ckpt.save_state(pjoin(stage_cfg.model_dir, "latest"), state,
                        args.epochs_per_stage, it)
        print(f"stage {n_steps}: wrote {stage_cfg.save_root} "
              f"(evaluate with tools/evaluation.py --opt_path "
              f"{pjoin(stage_cfg.save_root, 'opt.txt')})")
        # the student becomes the next stage's teacher
        teacher_params = jax.tree_util.tree_map(jax.numpy.copy, state.params)
        student_params = state.params


if __name__ == "__main__":
    main()
