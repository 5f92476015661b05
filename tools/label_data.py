"""Role discovery + pseudo-label generation (PIT stages 1-2a/1-2b).

Equivalent of codes/tools/label_data.py:
  --label_model : discover per-class role orientation on the annotated
                  clips (test_ann_ids.txt + test_active_anns.json)
                  → <save_root>/pit_labels.json
  --save_label  : pseudo-label the whole training split
                  → <data_root>/pseudo_labels.json
"""

import argparse
import json
import os
from os.path import join as pjoin

from _common import load_stats, restore_trainer_state  # noqa: E402

from hig_tpu.config import load_opt_txt
from hig_tpu.data.dataset import PairDataset, epoch_batches
from hig_tpu.train import labeling


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--opt_path", type=str, required=True)
    parser.add_argument("--which_epoch", type=str, default="latest")
    parser.add_argument("--label_path", type=str, default=None,
                        help="human role annotations json (discovery)")
    parser.add_argument("--ann_split", type=str, default="test_ann_ids.txt")
    parser.add_argument("--label_model", action="store_true")
    parser.add_argument("--save_label", action="store_true")
    parser.add_argument("--batch_size", type=int, default=64)
    args = parser.parse_args()

    cfg = load_opt_txt(args.opt_path, is_train=False)
    mean, std = load_stats(cfg, for_training=False)
    trainer, state, _, _ = restore_trainer_state(cfg, args.which_epoch)
    scorer = labeling.make_assignment_scorer(trainer.model, trainer.sched)

    if args.label_model:
        label_path = args.label_path or pjoin(cfg.data_root, "test_active_anns.json")
        annotated = PairDataset(
            cfg, mean, std, args.ann_split, label_path=label_path
        )
        roles = labeling.discover_roles(
            scorer, state.params, annotated, args.batch_size, epoch_batches,
            cap_id=cfg.cap_id,
        )
        out = pjoin(cfg.save_root, "pit_labels.json")
        labeling.save_json(roles, out)
        print(f"wrote {out}")

    if args.save_label:
        with open(pjoin(cfg.save_root, "pit_labels.json")) as f:
            roles = json.load(f)
        train_ds = PairDataset(cfg, mean, std, "train_sub.txt")
        labels = labeling.pseudo_label(
            scorer, state.params, train_ds, args.batch_size, roles, epoch_batches,
            cap_id=cfg.cap_id,
        )
        out = pjoin(cfg.data_root, "pseudo_labels.json")
        labeling.save_json(labels, out)
        print(f"wrote {out} ({len(labels)} clips)")


if __name__ == "__main__":
    main()
