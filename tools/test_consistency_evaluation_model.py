"""Test accuracy (overall and per class) for the consistency model.

Equivalent of codes/tools/test_consistency_evaluation_model.py.
"""

import argparse
from collections import defaultdict
from os.path import join as pjoin

import jax
import jax.numpy as jnp
import numpy as np

from _common import load_stats  # noqa: E402

from hig_tpu.config import load_opt_txt
from hig_tpu.data.dataset import PairMismatchDataset, epoch_batches
from hig_tpu.models.eval_models import MotionConsistencyEvalModel
from hig_tpu.train import checkpoint as ckpt


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--opt_path", type=str, required=True)
    parser.add_argument("--split_file", type=str, default="test_sub.txt")
    args = parser.parse_args()

    cfg = load_opt_txt(args.opt_path, is_train=False)
    mean, std = load_stats(cfg, for_training=False)
    ds = PairMismatchDataset(cfg, mean, std, args.split_file)

    model = MotionConsistencyEvalModel(
        input_feats=cfg.dim_pose - 4, num_frames=cfg.max_motion_length,
        latent_dim=cfg.latent_dim, ff_size=cfg.ff_size,
        num_layers=cfg.num_layers, num_heads=cfg.num_heads,
    )
    T = cfg.window_size + 1
    x = jnp.zeros((1, 2, T, cfg.dim_pose - 4))
    init_params = jax.jit(model.init)(jax.random.key(0), x, jnp.full((1,), T, jnp.int32))
    params = ckpt.restore_params(pjoin(cfg.model_dir, "best_eval_model"), init_params)

    apply = jax.jit(model.apply)
    correct, total = 0, 0
    per_class = defaultdict(lambda: [0, 0])
    for batch in epoch_batches(ds, cfg.batch_size, 0, shuffle=False, drop_last=False):
        logits = apply(
            params, jnp.asarray(batch["motion"][..., :-4]), jnp.asarray(batch["lengths"])
        )
        pred = np.asarray(jnp.argmax(logits, -1))
        label = batch["dummy_label"]
        for p, l, c in zip(pred, label, batch["class_id"]):
            per_class[int(c)][0] += int(p == l)
            per_class[int(c)][1] += 1
            correct += int(p == l)
            total += 1
    print(f"overall accuracy: {correct / total:.4f} ({total} samples)")
    for c in sorted(per_class):
        hit, n = per_class[c]
        print(f"class {c:2d}: {hit / n:.4f} ({n})")


if __name__ == "__main__":
    main()
