"""Train the 26-way interaction classifier (evaluation model).

Equivalent of codes/tools/train_evaluation_model.py.
"""

import argparse
import os
from os.path import join as pjoin

from _common import load_stats  # noqa: E402

from hig_tpu.config import add_config_args, config_from_args, save_opt_txt
from hig_tpu.data.dataset import PairDataset
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

    train_ds = PairDataset(cfg, mean, std, "train_sub.txt", train_eval=True)
    val_ds = PairDataset(cfg, mean, std, "val_sub.txt", train_eval=True)
    trainer = EvalModelTrainer(cfg, "classifier")
    _, best_acc, _ = trainer.train(train_ds, val_ds)
    print(f"best val accuracy: {best_acc:.4f}")


if __name__ == "__main__":
    main()
