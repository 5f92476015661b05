"""Tests for role discovery / pseudo-labeling and the evaluation stack."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hig_tpu.config import ExperimentConfig, add_dataset_paths
from hig_tpu.eval import metrics as M
from hig_tpu.models.text_encoder import ClipTextConfig

TINY_CLIP = ClipTextConfig(width=32, heads=4, layers=2)


def tiny_cfg(root, **kw):
    cfg = ExperimentConfig(
        name="tiny_eval", dataset_name="synthetic_mul", data_root=root,
        checkpoints_dir=os.path.join(os.path.dirname(root), "ckpt"),
        num_layers=2, latent_dim=32, ff_size=64, num_heads=4,
        num_text_layers=1, text_latent_dim=16, text_ff_size=32, text_num_heads=2,
        diffusion_steps=1000, batch_size=8, window_size=24, **kw,
    )
    return add_dataset_paths(cfg)


class TestMetrics:
    def test_fid_zero_for_identical(self):
        rng = np.random.RandomState(0)
        act = rng.randn(200, 16)
        assert abs(M.fid_from_activations(act, act)) < 1e-6

    def test_fid_positive_for_shifted(self):
        rng = np.random.RandomState(0)
        a = rng.randn(300, 16)
        b = rng.randn(300, 16) + 3.0
        fid = M.fid_from_activations(b, a)
        assert fid > 5.0

    def test_diversity_and_multimodality(self):
        rng = np.random.RandomState(1)
        act = rng.randn(100, 8)
        d = M.calculate_diversity(act, 50, np.random.RandomState(0))
        assert d > 0
        act3 = rng.randn(5, 20, 8)
        mm = M.calculate_multimodality(act3, 10, np.random.RandomState(0))
        assert mm > 0
        # identical samples per caption → zero multimodality
        same = np.repeat(rng.randn(5, 1, 8), 20, axis=1)
        assert M.calculate_multimodality(same, 10, np.random.RandomState(0)) == 0.0

    def test_r_precision_perfect_match(self):
        emb = np.eye(8, 16)
        top = M.calculate_R_precision(emb, emb, 3, sum_all=True)
        assert top[0] == 8  # top-1 exact

    def test_metric_statistics(self):
        mean, conf = M.get_metric_statistics(np.asarray([1.0, 2.0, 3.0]), 3)
        np.testing.assert_allclose(mean, 2.0)
        assert conf > 0


class TestEvalHarness:
    def test_window_rows_layout(self):
        from hig_tpu.eval.evaluator import window_rows

        D = 7
        motion = np.zeros((2, 50, D), np.float32)
        motion[:, 0, :4] = 99.0  # init token at row 0 (generated layout)
        for t in range(1, 50):
            motion[:, t, 0] = t
        out = window_rows(motion, 40, np.random.default_rng(0), num_frames=30)
        assert out.shape == (2, 31, D)
        np.testing.assert_array_equal(out[:, 0, :4], 99.0)  # init back at 0
        assert out[0, 1, 0] >= 1  # frames follow

    def test_window_rows_short_clip_pads(self):
        from hig_tpu.eval.evaluator import window_rows

        motion = np.random.randn(2, 12, 5).astype(np.float32)
        out = window_rows(motion, 12, np.random.default_rng(0), num_frames=30)
        assert out.shape == (2, 31, 5)
        np.testing.assert_array_equal(out[:, -1], out[:, -2])  # padded tail


@pytest.fixture(scope="module")
def eval_world(synth_root):
    """Tiny trained evaluator models + a mini generated set."""
    from hig_tpu.data.dataset import PairDataset, PairMismatchDataset
    from hig_tpu.train.eval_trainer import EvalModelTrainer

    cfg = tiny_cfg(synth_root, num_epochs=3)
    mean = np.load(os.path.join(synth_root, "Mean.npy"))
    std = np.load(os.path.join(synth_root, "Std.npy"))
    train_ds = PairDataset(cfg, mean, std, "train_sub.txt", train_eval=True)
    val_ds = PairDataset(cfg, mean, std, "val_sub.txt", train_eval=True)

    cls_trainer = EvalModelTrainer(cfg, "classifier")
    cls_state, best_acc, _ = cls_trainer.train(
        train_ds, val_ds, num_epochs=3, log=lambda *_: None
    )

    cons_trainer = EvalModelTrainer(cfg, "consistency")
    cons_train = PairMismatchDataset(cfg, mean, std, "train_sub.txt")
    cons_val = PairMismatchDataset(cfg, mean, std, "val_sub.txt")
    cons_state, _, _ = cons_trainer.train(
        cons_train, cons_val, num_epochs=2, log=lambda *_: None
    )
    return cfg, mean, std, cls_trainer, cls_state, cons_trainer, cons_state


class TestEvalModelTraining:
    def test_training_runs_and_saves_best(self, eval_world):
        cfg = eval_world[0]
        assert os.path.exists(os.path.join(cfg.model_dir, "best_eval_model"))

    def test_full_metric_suite(self, eval_world):
        from hig_tpu.data.dataset import PairDataset
        from hig_tpu.eval.evaluator import (
            GeneratedSet, evaluate_once, make_embedder, summarize,
        )

        cfg, mean, std, cls_tr, cls_st, cons_tr, cons_st = eval_world
        test_ds = PairDataset(cfg, mean, std, "test_sub.txt", eval_mode=True)
        gt_items = []
        for i in range(len(test_ds)):
            s = test_ds[i]
            # eval items carry the raw (2, T, D) with init row LAST; rebuild
            # from the dataset's windowed sample by rolling init back.
            motion = np.concatenate([s["motion"][:, 1:], s["motion"][:, :1]], axis=1)
            gt_items.append(
                dict(motion=np.concatenate([motion[:, -1:], motion[:, :-1]], axis=1),
                     length=int(s["length"]), class_id=int(s["class_id"]))
            )
        embed = make_embedder(cls_tr.model, cls_st.params, cons_tr.model, cons_st.params)
        # fake "generated" set = ground truth itself → FID ≈ 0, Acc equal
        gen = GeneratedSet(
            motions=gt_items,
            mm_groups={0: gt_items[:2]},
            gt_mm_groups={0: gt_items[:2]},
        )
        rng = np.random.default_rng(0)
        res = evaluate_once(embed, gt_items, gen, rng, diversity_times=5, mm_num_times=1)
        assert res["FID"]["text2motion"] < 1e-3
        assert res["Acc"]["ground truth"] == res["Acc"]["text2motion"]
        assert 0 <= res["Consistency"]["text2motion"] <= 1
        summary = summarize([res, res], 2)
        assert summary["FID"]["text2motion"][1] == 0.0  # identical reps → CI 0


class TestLabeling:
    def test_discovery_and_pseudo_labels(self, synth_root):
        """PIT scorer → discovery → pseudo labels, end to end on a tiny model."""
        from hig_tpu.data.dataset import PairDataset, epoch_batches
        from hig_tpu.train import labeling
        from hig_tpu.train.trainer import Trainer

        cfg = tiny_cfg(synth_root)
        mean = np.load(os.path.join(synth_root, "Mean.npy"))
        std = np.load(os.path.join(synth_root, "Std.npy"))
        trainer = Trainer(cfg, clip_config=TINY_CLIP)
        state = trainer.init_state()
        scorer = labeling.make_assignment_scorer(trainer.model, trainer.sched)

        annotated = PairDataset(cfg, mean, std, "val_sub.txt")
        import functools
        fast_batches = functools.partial(epoch_batches)
        roles = labeling.discover_roles(
            scorer, state.params, annotated, batch_size=8,
            epoch_batches=fast_batches,
        )
        assert len(roles) == 26
        asym = [r for r in roles.values() if "active_index" in r]
        assert len(asym) == 17  # 17 asymmetric classes
        for r in asym:
            assert r["active_index"] != r["passive_index"]

        train_ds = PairDataset(cfg, mean, std, "train_sub.txt")
        labels = labeling.pseudo_label(
            scorer, state.params, train_ds, batch_size=8, roles=roles,
            epoch_batches=fast_batches, repeats=2,
        )
        assert len(labels) == train_ds.real_len()
        assert set(labels.values()) <= {0, 1}

    def test_scorer_prefers_matching_assignment(self, synth_root):
        """With a denoiser biased toward assignment A, argmin picks A."""
        from hig_tpu.train import labeling
        from hig_tpu.diffusion import gaussian as g

        # Direct check of the scorer math: construct score inputs by hand.
        sched = g.make_schedule(g.linear_betas(1000))

        class FakeModel:
            cap_id = False

            def apply(self, params, *args, method=None, **kw):
                if method.__name__ == "encode_text":
                    cond = args[0]
                    B = cond.shape[0]
                    return jnp.zeros((B, 2, 8)), cond[..., :1, None] * jnp.ones((B, 2, 1, 4))
                # denoise: prediction quality depends on xf_out content
                x, t, lengths, xf_proj, xf_out = args[:5]
                bias = jnp.mean(xf_out, axis=(2, 3))[:, :, None, None]
                return bias * jnp.ones_like(x)

        fake = FakeModel()
        encode, score = labeling.make_assignment_scorer(fake, sched)
        motion = jnp.zeros((2, 2, 10, 6))
        lengths = jnp.full((2,), 10, jnp.int32)
        cond_a = jnp.zeros((2, 2, 77), jnp.int32)
        cond_b = jnp.ones((2, 2, 77), jnp.int32) * 100
        xf_proj, xf_out = encode(None, cond_a, cond_b)
        s = score(None, motion, lengths, xf_proj, xf_out, 900, jax.random.key(0))
        assert s.shape == (2, 2)
        # assignment A encodes zeros → prediction 0; x_t at t=900 is ~noise,
        # target=noise ⇒ nonzero loss either way but A's prediction is closer
        # to zero-mean noise than B's huge bias.
        assert bool(jnp.all(s[:, 0] < s[:, 1]))


class TestPerReplicationCaptionDraw:
    def test_replications_can_draw_different_captions(self):
        """tools/evaluation.py redraws captions per replication (the
        reference's shuffled eval loader re-draws every run); a frozen draw
        under-dispersed the CI (VERDICT r2 weak #6)."""
        import sys

        tools = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "tools")
        sys.path.insert(0, tools)
        try:
            from evaluation import draw_captions
        finally:
            sys.path.remove(tools)

        texts = [(f"caption A{i}", f"caption B{i}") for i in range(4)]
        samples = [
            dict(motion=None, length=10, class_id=0, texts=texts, name=f"clip{j}")
            for j in range(20)
        ]
        picks = {
            rep: [draw_captions(s, rep, seed=0, cap_same=False)["caption1"]
                  for s in samples]
            for rep in range(3)
        }
        # deterministic per (rep, clip): same call → same draw
        again = [draw_captions(s, 1, seed=0, cap_same=False)["caption1"]
                 for s in samples]
        assert picks[1] == again
        # but across replications the draws differ for some clips
        assert picks[0] != picks[1] or picks[1] != picks[2]
        # cap_same forces caption2 = caption1
        s = draw_captions(samples[0], 0, seed=0, cap_same=True)
        assert s["caption1"] == s["caption2"]


class TestDeviceFID:
    def test_matches_scipy_path(self):
        from hig_tpu.eval.metrics import (
            calculate_activation_statistics, calculate_frechet_distance,
            frechet_distance_device,
        )

        rng = np.random.RandomState(0)
        a = rng.randn(400, 24)
        b = rng.randn(400, 24) * 1.3 + 0.5
        mu1, c1 = calculate_activation_statistics(a)
        mu2, c2 = calculate_activation_statistics(b)
        want = calculate_frechet_distance(mu1, c1, mu2, c2)
        got = float(frechet_distance_device(
            jnp.asarray(mu1), jnp.asarray(c1), jnp.asarray(mu2), jnp.asarray(c2)
        ))
        np.testing.assert_allclose(got, want, rtol=1e-3)
