"""Progressive-distillation tests: grid construction, the closed-form
one-step target (must reproduce two teacher DDIM steps exactly), the
constant-teacher fixed point, and a tiny end-to-end distill step.

The reference has no few-step sampling at all (DDIM itself is dormant,
codes/models/gaussian_diffusion.py:771-941) — this whole surface is a
beat-the-reference axis, so the tests pin the math rather than parity.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hig_tpu.config import ExperimentConfig, add_dataset_paths
from hig_tpu.diffusion import distill as pd
from hig_tpu.diffusion import gaussian as g


@pytest.fixture(scope="module")
def sched():
    return g.make_schedule(g.named_betas("linear", 100))


class TestGrids:
    def test_nesting_and_bounds(self, sched):
        grids = pd.distill_grids(100, 10)
        np.testing.assert_array_equal(grids.ts, g.ddim_timesteps(100, 10))
        assert grids.ts_prev[-1] == -1
        assert np.array_equal(grids.ts_prev[:-1], grids.ts[1:])
        # teacher midpoint strictly interior to every transition except the
        # final 0 -> -1 hop, where mid == t (exact-identity first half-step)
        assert np.all(grids.ts[:-1] > grids.ts_mid[:-1])
        assert np.all(grids.ts_mid > grids.ts_prev)
        assert grids.ts[-1] == 0 and grids.ts_mid[-1] == 0

    def test_too_dense_raises(self):
        with pytest.raises(ValueError, match="too dense"):
            pd.distill_grids(100, 80)

    def test_halving_stages(self):
        assert pd.halving_stages(50) == [25, 13, 7, 4]
        assert pd.halving_stages(8, min_steps=2) == [4, 2]
        assert pd.halving_stages(2, min_steps=1) == [1]

    def test_teacher_snapped_midpoints(self):
        """With teacher_steps given, every midpoint with an interior teacher
        grid point snaps onto the teacher's own trained grid."""
        tgrid = set(g.ddim_timesteps(100, 9).tolist())
        grids = pd.distill_grids(100, 5, teacher_steps=9)
        # 5 = (9+1)//2: the ladder's exact-nesting case — student points are
        # teacher points, and every interior midpoint is a teacher point.
        assert set(grids.ts.tolist()) <= tgrid
        for t, tp, m in zip(grids.ts, grids.ts_prev, grids.ts_mid):
            interior = [p for p in tgrid if tp < p < t]
            if interior:
                assert int(m) in tgrid and tp < int(m) < t
            else:
                assert int(m) == int(t)  # clamped identity half-step
        # without teacher_steps: unchanged blind-midpoint behavior
        blind = pd.distill_grids(100, 5)
        np.testing.assert_array_equal(blind.ts, grids.ts)
        np.testing.assert_array_equal(blind.ts_prev, grids.ts_prev)

    def test_final_rung_two_to_one(self):
        """The 2 -> 1 rung: the 2-step teacher's grid is {T-1, 0}; the
        student's single T-1 -> x0 transition must route the teacher through
        mid = 0 (its own two-step path), never the blind midpoint where the
        distilled teacher was never supervised."""
        grids = pd.distill_grids(100, 1, teacher_steps=2)
        np.testing.assert_array_equal(grids.ts, [99])
        np.testing.assert_array_equal(grids.ts_prev, [-1])
        np.testing.assert_array_equal(grids.ts_mid, [0])


class TestTargetMath:
    def test_ddim_step_matches_sampler_fast_path(self, sched):
        """One batched ddim_step == the production sampler's fused
        linear-coefficient update (gaussian.py:341-367) at every grid pair."""
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(4, 2, 8, 6)), jnp.float32)
        eps = jnp.asarray(rng.normal(size=x.shape), jnp.float32)
        ts = g.ddim_timesteps(100, 10)
        ts_prev = np.append(ts[1:], -1)
        ab = np.asarray(sched.alphas_cumprod, np.float32)
        abp = np.append(ab, np.float32(1.0))[ts_prev]
        c1 = np.sqrt(abp) * np.asarray(sched.sqrt_recip_alphas_cumprod)[ts]
        c2 = np.sqrt(1.0 - abp) - np.sqrt(abp) * np.asarray(
            sched.sqrt_recipm1_alphas_cumprod
        )[ts]
        for k in range(len(ts)):
            t = jnp.full((4,), ts[k], jnp.int32)
            tp = jnp.full((4,), ts_prev[k], jnp.int32)
            got = pd.ddim_step(sched, x, eps, t, tp)
            want = c1[k] * x + c2[k] * eps
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=1e-5, atol=1e-5)

    def test_target_reproduces_two_teacher_steps(self, sched):
        """A single student DDIM step with the solved target must land
        exactly on the teacher's two-step endpoint — for a nonlinear
        teacher and mixed per-sample grid positions."""
        grids = pd.distill_grids(100, 10)
        rng = np.random.default_rng(1)
        B = 6
        x_t = jnp.asarray(rng.normal(size=(B, 2, 8, 6)), jnp.float32)
        i = jnp.asarray(rng.integers(0, grids.num_steps, size=B), jnp.int32)
        t = jnp.asarray(grids.ts)[i]
        t_mid = jnp.asarray(grids.ts_mid)[i]
        t_prev = jnp.asarray(grids.ts_prev)[i]

        def teacher(x, tt):
            scale = (tt.astype(jnp.float32) / 100.0).reshape(-1, 1, 1, 1)
            return jnp.tanh(x) * 0.3 + 0.1 * scale * x

        x0_target, weight = pd.distill_targets(sched, teacher, x_t, t, t_mid, t_prev)
        assert weight.shape == (B,) and bool(jnp.all(weight >= 1.0))

        # teacher endpoint, recomputed
        eps1 = teacher(x_t, t)
        x_mid = pd.ddim_step(sched, x_t, eps1, t, t_mid)
        x_pp = pd.ddim_step(sched, x_mid, teacher(x_mid, t_mid), t_mid, t_prev)
        # one student step using the target
        eps_tilde = g.predict_eps_from_xstart(sched, x_t, t, x0_target)
        got = pd.ddim_step(sched, x_t, eps_tilde, t, t_prev)
        np.testing.assert_allclose(np.asarray(got), np.asarray(x_pp),
                                   rtol=2e-4, atol=2e-4)

    def test_constant_teacher_is_fixed_point(self, sched):
        """For a teacher predicting a constant eps, two DDIM steps compose
        exactly into one, so the distillation target equals the teacher's
        own prediction — the student has nothing to learn."""
        grids = pd.distill_grids(100, 8)
        rng = np.random.default_rng(2)
        B = 5
        x_t = jnp.asarray(rng.normal(size=(B, 2, 4, 3)), jnp.float32)
        eps0 = jnp.asarray(rng.normal(size=x_t.shape), jnp.float32)
        i = jnp.asarray(rng.integers(0, grids.num_steps, size=B), jnp.int32)
        t = jnp.asarray(grids.ts)[i]
        x0_target, _ = pd.distill_targets(
            sched, lambda x, tt: eps0, x_t, t,
            jnp.asarray(grids.ts_mid)[i], jnp.asarray(grids.ts_prev)[i],
        )
        eps_tilde = g.predict_eps_from_xstart(sched, x_t, t, x0_target)
        np.testing.assert_allclose(np.asarray(eps_tilde), np.asarray(eps0),
                                   rtol=2e-3, atol=2e-3)

    def test_final_transition_target_is_teacher_endpoint(self, sched):
        """At t_prev = -1 (alpha_bar = 1) the solved x0 target IS the
        teacher's two-step endpoint."""
        grids = pd.distill_grids(100, 8)
        rng = np.random.default_rng(3)
        B = 4
        x_t = jnp.asarray(rng.normal(size=(B, 2, 4, 3)), jnp.float32)
        k = grids.num_steps - 1  # the last transition ends at -1
        t = jnp.full((B,), grids.ts[k], jnp.int32)
        t_mid = jnp.full((B,), grids.ts_mid[k], jnp.int32)
        t_prev = jnp.full((B,), grids.ts_prev[k], jnp.int32)
        assert int(t_prev[0]) == -1

        teacher = lambda x, tt: jnp.tanh(x) * 0.5
        x0_target, _ = pd.distill_targets(sched, teacher, x_t, t, t_mid, t_prev)
        eps1 = teacher(x_t, t)
        x_mid = pd.ddim_step(sched, x_t, eps1, t, t_mid)
        x_pp = pd.ddim_step(sched, x_mid, teacher(x_mid, t_mid), t_mid, t_prev)
        np.testing.assert_allclose(np.asarray(x0_target), np.asarray(x_pp),
                                   rtol=1e-5, atol=1e-5)


class TestDistillStep:
    def test_step_runs_and_loss_decreases(self, tmp_path):
        """Tiny interaction model: the distill step produces finite,
        decreasing loss on a fixed batch (student starts AT the teacher, so
        the initial loss is the genuine two-step/one-step gap)."""
        from hig_tpu.models.text_encoder import ClipTextConfig
        from hig_tpu.train.trainer import Trainer

        cfg = add_dataset_paths(ExperimentConfig(
            name="distill_tiny", dataset_name="synthetic_mul",
            data_root=str(tmp_path / "data"),
            checkpoints_dir=str(tmp_path / "ckpt"),
            num_layers=2, latent_dim=32, ff_size=64, num_heads=4,
            num_text_layers=1, text_latent_dim=16, text_ff_size=32,
            text_num_heads=2, diffusion_steps=50, batch_size=8,
            window_size=24, lr=1e-3, label_path="x",  # label_path → non-PIT
        ))
        trainer = Trainer(cfg, clip_config=ClipTextConfig(width=32, heads=4, layers=2))
        state = trainer.init_state()
        # A fresh init has zero-init output heads -> constant-eps teacher ->
        # distillation loss exactly 0 (the fixed point TestTargetMath pins).
        # Perturb all float leaves so the teacher is a nontrivial function.
        leaves, treedef = jax.tree_util.tree_flatten(state.params)
        keys = jax.random.split(jax.random.key(7), len(leaves))
        teacher_params = jax.tree_util.tree_unflatten(treedef, [
            leaf + 0.05 * jax.random.normal(k, leaf.shape, leaf.dtype)
            if jnp.issubdtype(leaf.dtype, jnp.floating) else leaf
            for leaf, k in zip(leaves, keys)
        ])
        import dataclasses as dc

        state = dc.replace(
            state, params=jax.tree_util.tree_map(jnp.copy, teacher_params)
        )

        grids = pd.distill_grids(50, 10)
        step = jax.jit(pd.make_distill_step(
            trainer.model, trainer.sched, trainer.tx, grids
        ))
        loss_fn = jax.jit(pd.make_distill_loss(trainer.model, trainer.sched, grids))
        rng = np.random.default_rng(0)
        batch = {
            "motion": jnp.asarray(rng.normal(size=(8, 2, 25, 263)), jnp.float32),
            "lengths": jnp.asarray(rng.integers(10, 26, size=(8,)), jnp.int32),
            "tokens": jnp.asarray(rng.integers(0, 100, size=(8, 2, 77)), jnp.int32),
        }
        # per-step training losses vary hugely with the timestep draw (the
        # truncated-SNR weight spans ~1..500), so progress is measured on a
        # FIXED evaluation key before vs after.
        eval_key = jax.random.key(1000)
        before, _ = loss_fn(state.params, teacher_params, batch, eval_key)
        assert np.isfinite(float(before)) and float(before) > 0
        for k in range(8):
            state, metrics = step(state, teacher_params, batch,
                                  jax.random.key(k))
            assert np.isfinite(float(metrics["loss_distill"]))
        after, _ = loss_fn(state.params, teacher_params, batch, eval_key)
        assert float(after) < float(before)


class TestDistillCfgTeacher:
    def test_cond_drop_distills_the_null_branch(self, tmp_path):
        """A CFG teacher (cond_drop_prob > 0) must have its NULL branch
        distilled too: with the teacher's caption dropout applied inside the
        distill loss, the student's null params receive gradient — otherwise
        guided sampling of a distilled checkpoint would blend an un-distilled
        unconditional eps (advisor r3 finding)."""
        from hig_tpu.models.text_encoder import ClipTextConfig
        from hig_tpu.train.trainer import Trainer

        cfg = add_dataset_paths(ExperimentConfig(
            name="distill_cfg", dataset_name="synthetic_mul",
            data_root=str(tmp_path / "data"),
            checkpoints_dir=str(tmp_path / "ckpt"),
            num_layers=2, latent_dim=32, ff_size=64, num_heads=4,
            num_text_layers=1, text_latent_dim=16, text_ff_size=32,
            text_num_heads=2, diffusion_steps=50, batch_size=4,
            window_size=24, label_path="x", cond_drop_prob=1.0,
        ))
        trainer = Trainer(cfg, clip_config=ClipTextConfig(width=32, heads=4, layers=2))
        state = trainer.init_state()
        leaves, treedef = jax.tree_util.tree_flatten(state.params)
        keys = jax.random.split(jax.random.key(11), len(leaves))
        teacher_params = jax.tree_util.tree_unflatten(treedef, [
            leaf + 0.05 * jax.random.normal(k, leaf.shape, leaf.dtype)
            if jnp.issubdtype(leaf.dtype, jnp.floating) else leaf
            for leaf, k in zip(leaves, keys)
        ])

        grids = pd.distill_grids(50, 10)
        loss_fn = pd.make_distill_loss(trainer.model, trainer.sched, grids)
        rng = np.random.default_rng(5)
        batch = {
            "motion": jnp.asarray(rng.normal(size=(4, 2, 25, 263)), jnp.float32),
            "lengths": jnp.asarray(rng.integers(10, 26, size=(4,)), jnp.int32),
            "tokens": jnp.asarray(rng.integers(0, 100, size=(4, 2, 77)), jnp.int32),
        }
        # student starts AT the (perturbed) teacher — a fresh init's
        # zero-init output heads would block gradient to everything upstream
        student_params = jax.tree_util.tree_map(jnp.copy, teacher_params)
        grads = jax.grad(
            lambda p: loss_fn(p, teacher_params, batch, jax.random.key(0))[0]
        )(student_params)
        g_null = float(jnp.abs(grads["params"]["null_xf_token"]).sum()) + \
            float(jnp.abs(grads["params"]["null_xf_proj"]).sum())
        assert g_null > 0.0, "null conditioning params got no distill gradient"
        # drop_prob 1.0 replaces ALL conditioning with the null branch, so
        # the text towers must receive NO gradient through the loss
        g_text = float(jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.abs(x).sum(),
            grads["params"]["clip"], jnp.zeros(()),
        )) if "clip" in grads["params"] else 0.0
        assert g_text == 0.0

    def test_fixed_w_guided_distillation(self, tmp_path):
        """distill_w != 1 (guided distillation, Meng et al. 2023 style): the
        teacher target is the guided blend at fixed w and the student is
        supervised under CONDITIONAL conditioning only — so the student's
        null params must receive NO gradient (guidance is internalized, the
        w=1 single-call sampler is the intended inference path), the loss is
        finite and positive when the branches differ, and a non-CFG teacher
        is refused."""
        from hig_tpu.models.text_encoder import ClipTextConfig
        from hig_tpu.train.trainer import Trainer

        cfg = add_dataset_paths(ExperimentConfig(
            name="distill_wcfg", dataset_name="synthetic_mul",
            data_root=str(tmp_path / "data"),
            checkpoints_dir=str(tmp_path / "ckpt"),
            num_layers=2, latent_dim=32, ff_size=64, num_heads=4,
            num_text_layers=1, text_latent_dim=16, text_ff_size=32,
            text_num_heads=2, diffusion_steps=50, batch_size=4,
            window_size=24, label_path="x", cond_drop_prob=0.2,
        ))
        trainer = Trainer(cfg, clip_config=ClipTextConfig(width=32, heads=4, layers=2))
        state = trainer.init_state()
        leaves, treedef = jax.tree_util.tree_flatten(state.params)
        keys = jax.random.split(jax.random.key(13), len(leaves))
        teacher_params = jax.tree_util.tree_unflatten(treedef, [
            leaf + 0.05 * jax.random.normal(k, leaf.shape, leaf.dtype)
            if jnp.issubdtype(leaf.dtype, jnp.floating) else leaf
            for leaf, k in zip(leaves, keys)
        ])

        grids = pd.distill_grids(50, 10)
        loss_fn = pd.make_distill_loss(
            trainer.model, trainer.sched, grids, distill_w=2.0
        )
        rng = np.random.default_rng(9)
        batch = {
            "motion": jnp.asarray(rng.normal(size=(4, 2, 25, 263)), jnp.float32),
            "lengths": jnp.asarray(rng.integers(10, 26, size=(4,)), jnp.int32),
            "tokens": jnp.asarray(rng.integers(0, 100, size=(4, 2, 77)), jnp.int32),
        }
        student_params = jax.tree_util.tree_map(jnp.copy, teacher_params)
        (loss, _), grads = jax.value_and_grad(
            lambda p: loss_fn(p, teacher_params, batch, jax.random.key(0)),
            has_aux=True,
        )(student_params)
        # the student starts AT the teacher, so its conditional one-step
        # prediction != the teacher's guided two-step composite -> loss > 0
        assert np.isfinite(float(loss)) and float(loss) > 0
        g_null = float(jnp.abs(grads["params"]["null_xf_token"]).sum()) + \
            float(jnp.abs(grads["params"]["null_xf_proj"]).sum())
        assert g_null == 0.0, \
            "guided distillation must not touch the student's null branch"
        g_total = float(jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.abs(x).sum(), grads["params"], jnp.zeros(())
        ))
        assert g_total > 0.0, "no gradient reached the student at all"

        # a non-CFG teacher has no null branch to blend with
        cfg0 = add_dataset_paths(ExperimentConfig(
            name="distill_w0", dataset_name="synthetic_mul",
            data_root=str(tmp_path / "data"),
            checkpoints_dir=str(tmp_path / "ckpt"),
            num_layers=2, latent_dim=32, ff_size=64, num_heads=4,
            num_text_layers=1, text_latent_dim=16, text_ff_size=32,
            text_num_heads=2, diffusion_steps=50, batch_size=4,
            window_size=24, label_path="x",
        ))
        trainer0 = Trainer(cfg0, clip_config=ClipTextConfig(width=32, heads=4, layers=2))
        with pytest.raises(ValueError, match="distill_w"):
            pd.make_distill_loss(trainer0.model, trainer0.sched, grids,
                                 distill_w=2.0)
