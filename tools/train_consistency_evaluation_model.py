"""Train the binary mutual-consistency evaluation model.

Equivalent of codes/tools/train_consistency_evaluation_model.py (Adam lr/5,
mismatched pairs sampled from the same class with p=0.5).
"""

import argparse
import os
from os.path import join as pjoin

from _common import load_stats  # noqa: E402

from hig_tpu.config import add_config_args, config_from_args, save_opt_txt
from hig_tpu.data.dataset import PairMismatchDataset
from hig_tpu.train.eval_trainer import EvalModelTrainer


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    add_config_args(parser)
    args = parser.parse_args()
    cfg = config_from_args(args, is_train=True)

    os.makedirs(cfg.model_dir, exist_ok=True)
    os.makedirs(cfg.meta_dir, exist_ok=True)
    save_opt_txt(cfg, pjoin(cfg.save_root, "opt.txt"))
    mean, std = load_stats(cfg, for_training=True)

    train_ds = PairMismatchDataset(cfg, mean, std, "train_sub.txt")
    val_ds = PairMismatchDataset(cfg, mean, std, "val_sub.txt")
    trainer = EvalModelTrainer(cfg, "consistency")
    _, best_acc, _ = trainer.train(train_ds, val_ds)
    print(f"best val accuracy: {best_acc:.4f}")


if __name__ == "__main__":
    main()
