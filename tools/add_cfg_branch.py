"""Upgrade a trained checkpoint with a classifier-free-guidance null branch.

Beat-the-reference tool: the reference's only guidance hook is the
classifier ``cond_fn`` (codes/models/gaussian_diffusion.py:567-604), and a
CFG model normally has to be trained with caption dropout from scratch.
This tool WARM-STARTS one instead: it copies a trained non-CFG experiment
into a new experiment directory whose model carries the (zero-initialized)
``null_xf_proj``/``null_xf_token`` parameters and ``cond_drop_prob`` set,
so a short ``--is_continue`` finetune teaches the null branch while the
conditional behavior starts exactly at the donor's optimum. This also makes
the guidance w-sweep a clean A/B: the w=1 sampler equals the donor up to
the finetune delta, isolating the guidance effect from training-run
variance.

Example:
  python tools/add_cfg_branch.py \
      --opt_path  ckpt/synthetic_mul/eq_interaction/opt.txt \
      --name eq_interaction_cfg --cond_drop_prob 0.2
  python tools/train.py --name eq_interaction_cfg ... --cond_drop_prob 0.2 \
      --num_epochs <donor+K> --is_continue
"""

import argparse
import dataclasses
import os
import shutil
from os.path import join as pjoin

import jax
import jax.numpy as jnp
import numpy as np

from _common import restore_trainer_state  # noqa: E402  (sys.path)

from hig_tpu.config import load_opt_txt, save_opt_txt
from hig_tpu.train import checkpoint as ckpt
from hig_tpu.train.trainer import Trainer, TrainState


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--opt_path", type=str, required=True,
                        help="donor experiment's opt.txt (trained WITHOUT "
                             "cond_drop_prob)")
    parser.add_argument("--model_name", type=str, default="latest")
    parser.add_argument("--name", type=str, required=True,
                        help="new experiment name")
    parser.add_argument("--cond_drop_prob", type=float, default=0.1)
    args = parser.parse_args()

    cfg = load_opt_txt(args.opt_path, is_train=True)
    if getattr(cfg, "cond_drop_prob", 0.0) > 0:
        raise SystemExit("donor already has cond_drop_prob > 0 — nothing to add")
    # the graft is a host-side tree edit — run it on whatever devices exist
    # (a donor trained on an NxM mesh still grafts on one chip)
    from hig_tpu.config import MeshConfig

    cfg = dataclasses.replace(cfg, mesh=MeshConfig(), pp_micro=0,
                              fsdp=False, tp=False)
    trainer, state, epoch, it = restore_trainer_state(cfg, args.model_name)
    donor_params = state.params

    cfg_new = dataclasses.replace(
        cfg, name=args.name, cond_drop_prob=args.cond_drop_prob,
        is_continue=False,
    )
    trainer_new = Trainer(cfg_new)
    state_new = trainer_new.init_state()

    def graft_tree(donor_tree, new_tree):
        # graft: every donor leaf lands in the new tree by path; the only
        # new leaves are the zero-init null params (so w=1 sampling of the
        # grafted checkpoint is EXACTLY the donor — null params are
        # unreachable there)
        flat_donor = dict(jax.tree_util.tree_flatten_with_path(donor_tree)[0])
        flat_new = jax.tree_util.tree_flatten_with_path(new_tree)[0]
        grafted, added = [], []
        for path, leaf in flat_new:
            if path in flat_donor:
                d = flat_donor.pop(path)
                if d.shape != leaf.shape:
                    raise SystemExit(
                        f"shape mismatch at {path}: {d.shape} vs {leaf.shape}")
                grafted.append(d)
            else:
                added.append(jax.tree_util.keystr(path))
                grafted.append(leaf)
        if flat_donor:
            raise SystemExit(f"donor leaves not consumed: {list(flat_donor)[:4]}")
        expected = {"['params']['null_xf_proj']", "['params']['null_xf_token']"}
        if set(added) != expected:
            raise SystemExit(f"unexpected new leaves: {added}")
        return jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(new_tree), grafted
        ), added

    params, added = graft_tree(donor_params, state_new.params)

    # EMA: init_state() seeds ema_params from the FRESH RANDOM init, which
    # would silently corrupt eval_params() (it prefers EMA). Seed from the
    # donor's trained EMA when it has one, else from the grafted params.
    if getattr(cfg_new, "ema_decay", 0.0) > 0:
        if getattr(state, "ema_params", None) is not None:
            ema_out, _ = graft_tree(state.ema_params, state_new.params)
        else:
            ema_out = jax.tree_util.tree_map(jnp.copy, params)
    else:
        ema_out = None

    state_out = TrainState(
        params=params, opt_state=trainer_new.tx.init(params),
        step=state.step,
        ema_params=ema_out,
    )
    os.makedirs(cfg_new.model_dir, exist_ok=True)
    os.makedirs(cfg_new.meta_dir, exist_ok=True)
    for stat in ("mean.npy", "std.npy"):
        src = pjoin(cfg.meta_dir, stat)
        if os.path.exists(src):
            shutil.copyfile(src, pjoin(cfg_new.meta_dir, stat))
    save_opt_txt(cfg_new, pjoin(cfg_new.save_root, "opt.txt"))
    ckpt.save_state(pjoin(cfg_new.model_dir, "latest"), state_out,
                    epoch=epoch, total_it=it)
    n_leaves = len(jax.tree_util.tree_leaves(params))
    print(f"grafted {n_leaves - len(added)} leaves from "
          f"{cfg.name}@{args.model_name} (epoch {epoch}, it {it}); "
          f"added {sorted(added)}")
    print(f"new experiment: {cfg_new.save_root} — finetune with "
          f"tools/train.py --name {args.name} --cond_drop_prob "
          f"{args.cond_drop_prob} --is_continue")


if __name__ == "__main__":
    main()
