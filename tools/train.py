"""Train the interaction (or PIT) diffusion model.

Equivalent of codes/tools/train.py. Stage 1-1 (PIT): run without
--label_path (+ --cap_id to match the reference's PIT config). Stage 1-3:
run with --label_path pseudo_labels.json.

Example:
  python tools/train.py --name pit --dataset_name ntu_mul --cap_id \
      --batch_size 640 --times 30 --num_epochs 50
  python tools/train.py --name interaction --dataset_name ntu_mul \
      --label_path data/NTURGBD_multi/pseudo_labels.json \
      --batch_size 480 --times 200 --num_epochs 50
"""

import argparse
import os
from os.path import join as pjoin

from _common import load_stats  # noqa: E402  (sys.path set in _common)

from hig_tpu.config import add_config_args, config_from_args, save_opt_txt
from hig_tpu.data.dataset import PairDataset


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    add_config_args(parser)
    parser.add_argument(
        "--pretrained_path", type=str,
        default="checkpoints/t2m/t2m_motiondiffuse/model/latest.tar",
        help="reference torch checkpoint for --pretrained transfer "
             "(ref tools/train.py:48-50)",
    )
    args = parser.parse_args()
    cfg = config_from_args(args, is_train=True)

    from hig_tpu.utils.cache import enable as enable_cache

    enable_cache()  # resumes/twins re-pay identical step compiles otherwise

    if cfg.distributed:
        # multi-host entry: TPU pods autodetect; explicit setups use
        # HIG_COORDINATOR / HIG_NUM_PROCESSES / HIG_PROCESS_ID
        # (ref: init_dist('slurm'), base_options.py:77-78)
        from hig_tpu.parallel import distributed as dist

        dist.initialize()
        print(f"process {dist.process_index()}/{dist.process_count()}, "
              f"{len(__import__('jax').devices())} global devices")

    os.makedirs(cfg.model_dir, exist_ok=True)
    os.makedirs(cfg.meta_dir, exist_ok=True)
    if not cfg.distributed or __import__("jax").process_index() == 0:
        # rank-0 opt.txt persistence (ref: base_options.py:86-95 + barrier)
        save_opt_txt(cfg, pjoin(cfg.save_root, "opt.txt"))

    mean, std = load_stats(cfg, for_training=True)
    dataset = PairDataset(
        cfg, mean, std, "train_sub.txt", times=cfg.times,
        label_path=cfg.label_path, seed=cfg.seed,
    )
    print(f"dataset: {dataset.real_len()} clips x times={cfg.times}")

    from hig_tpu.train import checkpoint as ckpt
    from hig_tpu.train.trainer import Trainer

    trainer = Trainer(cfg)
    state = trainer.init_state()
    if cfg.pretrained:
        import dataclasses as _dc

        from hig_tpu.train import torch_port as tp

        sd = tp.load_torch_state_dict(args.pretrained_path)
        converted = tp.convert_interaction_model(
            sd,
            num_layers=cfg.num_layers,
            num_text_layers=cfg.num_text_layers,
            interaction=not cfg.no_cross_attn,
            cap_id=cfg.cap_id,
            only_language=cfg.only_language,
            only_motion=cfg.only_motion,
        )
        merged = tp.merge_params(state.params["params"], converted)
        state = _dc.replace(state, params={**state.params, "params": merged})
        print(f"loaded pretrained weights from {args.pretrained_path}")
    start_epoch = 0
    if cfg.is_continue:
        state, epoch, it = ckpt.restore_state(pjoin(cfg.model_dir, "latest"), state)
        state = trainer.place_state(state)
        # resume the epoch loop where it stopped (ref: mul_ddpm_trainer.py:310
        # iterates range(cur_epoch, num_epochs))
        start_epoch = epoch
        print(f"resumed from epoch {epoch}, it {it}")

    val_dataset = None
    if cfg.eval_every_e > 0 and os.path.exists(pjoin(cfg.data_root, "val_sub.txt")):
        val_dataset = PairDataset(
            cfg, mean, std, "val_sub.txt", times=1,
            label_path=cfg.label_path, seed=cfg.seed,
        )
    trainer.train(dataset, state, start_epoch=start_epoch, val_dataset=val_dataset)


if __name__ == "__main__":
    main()
