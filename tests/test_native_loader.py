"""Tests for the native C++ batch loader (builds it if needed)."""

import numpy as np
import pytest

from hig_tpu.data import native_loader as nl

pytestmark = pytest.mark.skipif(not nl.available(), reason="native loader unavailable")


@pytest.fixture(scope="module")
def store():
    rng = np.random.RandomState(0)
    D = 263
    mean = rng.randn(D + 4).astype(np.float32)
    std = (0.5 + rng.rand(D + 4)).astype(np.float32)
    s = nl.NativeClipStore(mean, std)
    clips = []
    for T in (30, 50, 120):
        clip = rng.randn(2, T, D).astype(np.float32)
        s.add_clip(clip)
        clips.append(clip)
    return s, clips, mean, std


class TestNativeLoader:
    def test_shapes_and_lengths(self, store):
        s, clips, mean, std = store
        motion, lengths = s.sample_batch(np.asarray([0, 1, 2]), window=90)
        assert motion.shape == (3, 2, 91, 263)
        np.testing.assert_array_equal(lengths, [30, 50, 91])

    def test_short_clip_matches_python_exactly(self, store):
        """For clips shorter than the window there is no randomness; the
        native output must equal the Python pipeline bit-for-bit."""
        from hig_tpu.data.dataset import normalize_pair, window_indices

        s, clips, mean, std = store
        motion, _ = s.sample_batch(np.asarray([0]), window=90)
        clip = clips[0]
        ix = window_indices(clip.shape[1] - 1, np.random.default_rng(0), 90)
        want = normalize_pair(clip[:, ix], mean, std)
        np.testing.assert_allclose(motion[0], want, atol=1e-6)

    def test_deterministic_per_seed_epoch(self, store):
        s, *_ = store
        a, _ = s.sample_batch(np.asarray([2, 2]), window=90, seed=5, epoch=1)
        b, _ = s.sample_batch(np.asarray([2, 2]), window=90, seed=5, epoch=1)
        np.testing.assert_array_equal(a, b)
        c, _ = s.sample_batch(np.asarray([2, 2]), window=90, seed=5, epoch=2)
        assert not np.array_equal(a, c)  # long clip → shifted windows differ

    def test_swap_flags(self, store):
        s, *_ = store
        plain, _ = s.sample_batch(np.asarray([0]), window=90)
        swapped, _ = s.sample_batch(
            np.asarray([0]), window=90, swap_flags=np.asarray([1], np.uint8)
        )
        np.testing.assert_array_equal(swapped[0, 0], plain[0, 1])
        np.testing.assert_array_equal(swapped[0, 1], plain[0, 0])

    def test_store_from_dataset(self, synth_root, tmp_path):
        from hig_tpu.config import ExperimentConfig, add_dataset_paths
        from hig_tpu.data.dataset import PairDataset

        cfg = add_dataset_paths(
            ExperimentConfig(dataset_name="synthetic_mul", data_root=synth_root)
        )
        mean = np.load(f"{synth_root}/Mean.npy")
        std = np.load(f"{synth_root}/Std.npy")
        ds = PairDataset(cfg, mean, std, "train_sub.txt")
        store, swaps = nl.store_from_dataset(ds)
        assert len(store) == ds.real_len()
        motion, lengths = store.sample_batch(np.arange(min(8, len(store))))
        assert motion.shape[1:] == (2, 91, 263)
        assert np.isfinite(motion).all()

    def test_throughput_sanity(self, store):
        import time

        s, *_ = store
        idx = np.random.RandomState(0).randint(0, 3, 512).astype(np.int64)
        t0 = time.time()
        for epoch in range(10):
            s.sample_batch(idx, window=90, epoch=epoch)
        dt = time.time() - t0
        rate = 512 * 10 / dt
        print(f"native loader: {rate:.0f} samples/s")
        assert rate > 500  # very conservative floor (loaded CI machines); typically ≫5k/s
