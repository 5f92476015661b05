"""Shared CLI plumbing for tools/*."""

from __future__ import annotations

import os
import sys
from os.path import join as pjoin

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# This environment's site hook imports jax at interpreter startup, so the
# JAX_PLATFORMS env var is read before a tool's shell can matter — but the
# config knob still works any time before first backend use (same mechanism
# as tests/conftest.py). Honor the env var here so `JAX_PLATFORMS=cpu
# python tools/train.py ...` reliably pins the platform even when the axon
# (TPU tunnel) plugin registers but hangs on init.
if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np


def load_stats(cfg, for_training: bool):
    """mean/std: dataset-level Mean/Std for training (with feat_bias rescale,
    persisted to meta/), meta/mean std for inference/eval.

    (ref: tools/train.py:71-72, mul_dataset.py:137-161, evaluator.py:322-323)
    """
    from hig_tpu.data.dataset import rescale_std_train

    if for_training:
        mean = np.load(pjoin(cfg.data_root, "Mean.npy"))
        std = rescale_std_train(
            np.load(pjoin(cfg.data_root, "Std.npy")), cfg.joints_num, cfg.feat_bias
        )
        os.makedirs(cfg.meta_dir, exist_ok=True)
        np.save(pjoin(cfg.meta_dir, "mean.npy"), mean)
        np.save(pjoin(cfg.meta_dir, "std.npy"), std)
        return mean, std
    mean = np.load(pjoin(cfg.meta_dir, "mean.npy"))
    std = np.load(pjoin(cfg.meta_dir, "std.npy"))
    return mean, std


def restore_trainer_state(cfg, which: str = "latest"):
    """Build a Trainer and restore the named checkpoint."""
    from hig_tpu.train import checkpoint as ckpt
    from hig_tpu.train.trainer import Trainer

    trainer = Trainer(cfg)
    state = trainer.init_state()
    path = pjoin(cfg.model_dir, which)
    state, epoch, it = ckpt.restore_state(path, state)
    state = trainer.place_state(state)
    return trainer, state, epoch, it
