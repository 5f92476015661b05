"""Train the single-person (MotionDiffuse-style) diffusion model on t2m/kit.

The reference trains this model in the upstream MotionDiffuse repo and uses
its checkpoint as the --pretrained donor for the interaction model
(codes/tools/train.py:48-50); visualization.py's non-interaction branch
samples it. This CLI makes donor training runnable here end-to-end:

  python tools/train_single.py --name kit_single --dataset_name kit \
      --data_root data/KIT-ML --batch_size 128 --num_epochs 50

Caption files follow the HumanML3D format ``caption#tokens#f_tag#to_tag``;
nonzero tags segment the clip per caption (ref datasets/dataset.py:46-73).
"""

import argparse
import json
import os
import time
from os.path import join as pjoin

import numpy as np

from _common import load_stats  # noqa: E402  (sys.path set in _common)


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    from hig_tpu.config import add_config_args, config_from_args, save_opt_txt

    add_config_args(parser)
    parser.add_argument("--window", type=int, default=60,
                        help="training window frames (ref dataset.py single-person)")
    args = parser.parse_args()
    cfg = config_from_args(args, is_train=True)
    cfg.multi = False

    import jax
    import jax.numpy as jnp

    from hig_tpu.data.dataset import SingleMotionDataset, epoch_batches
    from hig_tpu.diffusion import gaussian as g
    from hig_tpu.models.interaction_model import SingleMotionModel
    from hig_tpu.parallel import mesh as pmesh
    from hig_tpu.train import checkpoint as ckpt
    from hig_tpu.train.trainer import (
        TrainState, make_optimizer, make_single_train_step,
    )

    os.makedirs(cfg.model_dir, exist_ok=True)
    os.makedirs(cfg.meta_dir, exist_ok=True)
    save_opt_txt(cfg, pjoin(cfg.save_root, "opt.txt"))

    mean, std = load_stats(cfg, for_training=True)
    dataset = SingleMotionDataset(
        cfg, mean, std, "train.txt", times=cfg.times, seed=cfg.seed,
        window=args.window,
    )
    print(f"dataset: {dataset.real_len()} clips (incl. caption segments) "
          f"x times={cfg.times}")

    model = SingleMotionModel(
        input_feats=cfg.dim_pose, num_frames=cfg.max_motion_length,
        latent_dim=cfg.latent_dim, ff_size=cfg.ff_size,
        num_layers=cfg.num_layers, num_heads=cfg.num_heads,
        text_latent_dim=cfg.text_latent_dim, text_ff_size=cfg.text_ff_size,
        text_num_heads=cfg.text_num_heads, num_text_layers=cfg.num_text_layers,
        dropout=cfg.dropout, efficient=not cfg.no_eff,
        dtype=jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32,
    )
    mesh = pmesh.make_mesh(cfg.mesh)
    sched = g.make_schedule(g.named_betas("linear", cfg.diffusion_steps))

    T = args.window + 1
    x = jnp.zeros((1, T, cfg.dim_pose))
    tokens0 = jnp.zeros((1, 77), jnp.int32)
    params = jax.jit(model.init)(
        jax.random.key(cfg.seed), x, jnp.zeros((1,), jnp.int32),
        jnp.full((1,), T, jnp.int32), tokens0,
    )
    tx = make_optimizer(cfg, params)
    state = TrainState(params=params, opt_state=tx.init(params),
                       step=jnp.zeros((), jnp.int32))
    state = jax.device_put(state, pmesh.replicated(mesh))

    start_epoch = 0
    if cfg.is_continue:
        state, start_epoch, it0 = ckpt.restore_state(
            pjoin(cfg.model_dir, "latest"), state
        )
        state = jax.device_put(state, pmesh.replicated(mesh))
        print(f"resumed from epoch {start_epoch}, it {it0}")

    step_fn = jax.jit(make_single_train_step(model, sched, tx), donate_argnums=(0,))
    base_rng = jax.random.key(cfg.seed + 1)
    metrics_path = pjoin(cfg.save_root, "metrics.jsonl")
    it = int(state.step)
    t0 = time.time()
    for epoch in range(start_epoch, cfg.num_epochs):
        for batch in epoch_batches(dataset, cfg.batch_size, epoch, seed=cfg.seed):
            dev = pmesh.shard_batch(mesh, {
                "motion": batch["motion"], "lengths": batch["lengths"],
                "tokens": batch["tokens"],
            })
            state, metrics = step_fn(state, dev, jax.random.fold_in(base_rng, it))
            it += 1
            if it % cfg.log_every == 0:
                loss = float(metrics["loss_mot_rec"])
                print(f"epoch {epoch} it {it} loss: {loss:.5f} "
                      f"({time.time() - t0:.0f}s)")
                with open(metrics_path, "a") as f:
                    f.write(json.dumps({"it": it, "epoch": epoch,
                                        "loss_mot_rec": loss}) + "\n")
            if it % cfg.save_latest == 0:
                ckpt.save_state(pjoin(cfg.model_dir, "latest"), state, epoch, it)
        ckpt.save_state(pjoin(cfg.model_dir, "latest"), state, epoch + 1, it)
    print(f"done: {it} steps")


if __name__ == "__main__":
    main()
