"""Test accuracy + confusion matrix for the trained classifier.

Equivalent of codes/tools/test_evaluation_model.py.
"""

import argparse
import os
from os.path import join as pjoin

import jax.numpy as jnp
import numpy as np

from _common import load_stats  # noqa: E402

from hig_tpu.config import load_opt_txt
from hig_tpu.data.dataset import PairDataset, epoch_batches
from hig_tpu.data.vocab import NUM_CLASSES


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--opt_path", type=str, required=True)
    parser.add_argument("--split_file", type=str, default="test_sub.txt")
    args = parser.parse_args()

    cfg = load_opt_txt(args.opt_path, is_train=False)
    mean, std = load_stats(cfg, for_training=False)
    ds = PairDataset(cfg, mean, std, args.split_file, train_eval=True)

    import jax
    from hig_tpu.models.eval_models import MotionEncoder
    from hig_tpu.train import checkpoint as ckpt

    enc = MotionEncoder(
        input_feats=cfg.dim_pose - 4, num_frames=cfg.max_motion_length,
        latent_dim=cfg.latent_dim, ff_size=cfg.ff_size,
        num_layers=cfg.num_layers, num_heads=cfg.num_heads, class_num=NUM_CLASSES,
    )
    T = cfg.window_size + 1
    x = jnp.zeros((1, 2, T, cfg.dim_pose - 4))
    init_params = jax.jit(enc.init)(jax.random.key(0), x, jnp.full((1,), T, jnp.int32))
    params = ckpt.restore_params(pjoin(cfg.model_dir, "best_eval_model"), init_params)

    apply = jax.jit(enc.apply)
    preds, gts = [], []
    for batch in epoch_batches(ds, cfg.batch_size, 0, shuffle=False, drop_last=False):
        logits, _ = apply(
            params, jnp.asarray(batch["motion"][..., :-4]), jnp.asarray(batch["lengths"])
        )
        preds.extend(np.asarray(jnp.argmax(logits, -1)).tolist())
        gts.extend(batch["class_id"].tolist())
    preds, gts = np.asarray(preds[: len(ds)]), np.asarray(gts[: len(ds)])
    acc = float((preds == gts).mean())
    print(f"test accuracy: {acc:.4f} over {len(gts)} samples")
    cm = np.zeros((NUM_CLASSES, NUM_CLASSES), np.int64)
    for p, g in zip(preds, gts):
        cm[g, p] += 1
    out = pjoin(cfg.save_root, "confusion_matrix_test.npy")
    np.save(out, cm)
    # PNG render for parity with the reference's image side effect
    # (test_evaluation_model.py confusion-matrix plot)
    import sys as _sys

    _sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from evaluation import save_confusion_png

    save_confusion_png(cm, pjoin(cfg.save_root, "confusion_matrix_test.png"))
    print(f"wrote {out} (+ .png)")


if __name__ == "__main__":
    main()
