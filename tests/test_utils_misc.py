"""Tests for profiling utilities, XLA cache setup, and batching determinism."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np


class TestProfiling:
    def test_step_timer(self, tmp_path):
        from hig_tpu.utils.profiling import StepTimer

        timer = StepTimer(items_per_step=32)
        for _ in range(5):
            with timer:
                sum(range(1000))
        s = timer.summary()
        assert s["steps"] == 5
        assert s["p50_ms"] > 0 and s["items_per_sec"] > 0
        path = str(tmp_path / "t.jsonl")
        timer.dump(path)
        assert json.loads(open(path).read())["steps"] == 5

    def test_device_trace_writes_files(self, tmp_path):
        from hig_tpu.utils.profiling import device_trace

        log_dir = str(tmp_path / "trace")
        with device_trace(log_dir):
            jnp.sum(jnp.ones((128, 128)) @ jnp.ones((128, 128))).block_until_ready()
        found = []
        for root, _, files in os.walk(log_dir):
            found.extend(files)
        assert found  # trace artifacts exist

    def test_cache_enable(self, tmp_path):
        from hig_tpu.utils.cache import enable

        d = enable(str(tmp_path / "cache"))
        assert os.path.isdir(d)
        assert jax.config.jax_compilation_cache_dir == d


class TestEpochBatches:
    def test_deterministic_order_per_seed_epoch(self, synth_root):
        from hig_tpu.config import ExperimentConfig, add_dataset_paths
        from hig_tpu.data.dataset import PairDataset, epoch_batches

        cfg = add_dataset_paths(
            ExperimentConfig(dataset_name="synthetic_mul", data_root=synth_root)
        )
        mean = np.load(os.path.join(synth_root, "Mean.npy"))
        std = np.load(os.path.join(synth_root, "Std.npy"))
        ds = PairDataset(cfg, mean, std, "train_sub.txt")
        a = [b["names"] for b in epoch_batches(ds, 8, epoch=3, seed=5)]
        b = [b["names"] for b in epoch_batches(ds, 8, epoch=3, seed=5)]
        assert a == b
        c = [b_["names"] for b_ in epoch_batches(ds, 8, epoch=4, seed=5)]
        assert a != c

    def test_round_up_padding(self, synth_root):
        from hig_tpu.config import ExperimentConfig, add_dataset_paths
        from hig_tpu.data.dataset import PairDataset, epoch_batches

        cfg = add_dataset_paths(
            ExperimentConfig(dataset_name="synthetic_mul", data_root=synth_root)
        )
        mean = np.load(os.path.join(synth_root, "Mean.npy"))
        std = np.load(os.path.join(synth_root, "Std.npy"))
        ds = PairDataset(cfg, mean, std, "train_sub.txt")
        n = len(ds)
        batches = list(epoch_batches(ds, 7, epoch=0, drop_last=False))
        total = sum(len(b["names"]) for b in batches)
        assert total % 7 == 0 and total >= n  # padded up, every batch full
        for b in batches:
            assert b["motion"].shape[0] == 7
