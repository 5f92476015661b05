"""DPM-Solver++(2M) tests: first-order degeneration to DDIM, second-order
convergence advantage over DDIM at equal step count, and integration with
the production sampler factory (hoisted-AdaLN aux included).

The reference has no ODE solver at all (even DDIM is dormant,
codes/models/gaussian_diffusion.py:771-941) — like distillation, this is a
beat-the-reference surface, so tests pin math, not parity.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hig_tpu.diffusion import gaussian as g
from hig_tpu.diffusion.solvers import dpmpp_2m_sample_loop


@pytest.fixture(scope="module")
def sched():
    return g.make_schedule(g.named_betas("linear", 1000))


def toy_model(x, t):
    """A fixed nonlinear eps-model (t-dependent, smooth) — enough structure
    for the ODE solvers to disagree at coarse steps."""
    s = (t.astype(jnp.float32) / 1000.0).reshape((-1,) + (1,) * (x.ndim - 1))
    return jnp.tanh(x) * (0.4 + 0.3 * s) + 0.1 * jnp.sin(3.0 * x) * (1.0 - s)


class TestDpmSolver:
    def test_two_steps_equal_ddim(self, sched):
        """With num_steps=2 every step is first-order (no history + the
        lower-order-final rule), and the first-order DPM++ update IS the
        DDIM update — outputs must match to fp tolerance."""
        shape = (3, 2, 6, 5)
        noise = jnp.asarray(np.random.default_rng(0).normal(size=shape), jnp.float32)
        rng = jax.random.key(1)
        out_dpm = dpmpp_2m_sample_loop(sched, toy_model, shape, rng, 2, noise=noise)
        out_ddim = g.ddim_sample_loop(sched, toy_model, shape, rng, num_steps=2,
                                      noise=noise)
        np.testing.assert_allclose(np.asarray(out_dpm), np.asarray(out_ddim),
                                   rtol=1e-4, atol=1e-4)

    def test_one_step_equals_ddim_one_step(self, sched):
        """num_steps=1 (the fully-distilled one-call regime): the single
        transition is the h→inf final hop, taken first-order as x = x0_pred —
        exactly the DDIM-1 update from the [T-1] grid."""
        shape = (3, 2, 6, 5)
        noise = jnp.asarray(np.random.default_rng(8).normal(size=shape), jnp.float32)
        rng = jax.random.key(9)
        out_dpm = dpmpp_2m_sample_loop(sched, toy_model, shape, rng, 1, noise=noise)
        out_ddim = g.ddim_sample_loop(sched, toy_model, shape, rng, num_steps=1,
                                      noise=noise)
        np.testing.assert_allclose(np.asarray(out_dpm), np.asarray(out_ddim),
                                   rtol=1e-4, atol=1e-4)
        # and it is the direct x0 prediction at t = T-1
        t = jnp.full((shape[0],), sched.num_timesteps - 1, jnp.int32)
        x0 = g.predict_xstart_from_eps(sched, noise, t, toy_model(noise, t))
        np.testing.assert_allclose(np.asarray(out_ddim), np.asarray(x0),
                                   rtol=1e-4, atol=1e-4)

    def test_second_order_converges_faster_than_ddim(self, sched):
        """Both samplers integrate the same probability-flow ODE; the
        well-converged DDIM-256 result is the reference solution. At 16
        steps the 2M solver must land closer to it than DDIM-16 does."""
        shape = (4, 2, 6, 5)
        noise = jnp.asarray(np.random.default_rng(2).normal(size=shape), jnp.float32)
        rng = jax.random.key(3)
        ref = g.ddim_sample_loop(sched, toy_model, shape, rng, num_steps=256,
                                 noise=noise)
        dpm16 = dpmpp_2m_sample_loop(sched, toy_model, shape, rng, 16, noise=noise)
        ddim16 = g.ddim_sample_loop(sched, toy_model, shape, rng, num_steps=16,
                                    noise=noise)
        err_dpm = float(jnp.linalg.norm(dpm16 - ref))
        err_ddim = float(jnp.linalg.norm(ddim16 - ref))
        assert np.isfinite(err_dpm) and np.isfinite(err_ddim)
        assert err_dpm < err_ddim, (err_dpm, err_ddim)
        # the advantage should be material, not a tie-breaker
        assert err_dpm < 0.7 * err_ddim, (err_dpm, err_ddim)

    def test_model_aux_threading(self, sched):
        """model_aux leaves (leading num_steps axis) are sliced per step and
        passed through — same contract as the DDIM sampler's AdaLN hook."""
        shape = (2, 2, 4, 3)
        noise = jnp.asarray(np.random.default_rng(4).normal(size=shape), jnp.float32)
        steps = 6
        aux = jnp.arange(steps, dtype=jnp.float32) * 0.01

        def model_with_aux(x, t, a):
            return jnp.tanh(x) * 0.5 + a

        def model_closed(x, t):
            # reproduce the aux schedule from t via the known grid
            ts = jnp.asarray(g.ddim_timesteps(1000, steps).copy())
            idx = jnp.argmax((ts == t[0]).astype(jnp.int32))
            return jnp.tanh(x) * 0.5 + 0.01 * idx.astype(jnp.float32)

        rng = jax.random.key(5)
        out_aux = dpmpp_2m_sample_loop(
            sched, model_with_aux, shape, rng, steps, noise=noise, model_aux=aux
        )
        out_ref = dpmpp_2m_sample_loop(
            sched, model_closed, shape, rng, steps, noise=noise
        )
        np.testing.assert_allclose(np.asarray(out_aux), np.asarray(out_ref),
                                   rtol=1e-5, atol=1e-5)

    def test_make_sampler_dpm_integration(self, tmp_path):
        """sampler='dpm' through the production factory: right shape, finite,
        and the hoisted-AdaLN path (enabled for dpm) agrees with the
        unhoisted path."""
        from hig_tpu.config import ExperimentConfig, add_dataset_paths
        from hig_tpu.models.text_encoder import ClipTextConfig
        from hig_tpu.train.trainer import Trainer, make_sampler

        cfg = add_dataset_paths(ExperimentConfig(
            name="dpm_tiny", dataset_name="synthetic_mul",
            data_root=str(tmp_path / "d"), checkpoints_dir=str(tmp_path / "c"),
            num_layers=2, latent_dim=32, ff_size=64, num_heads=4,
            num_text_layers=1, text_latent_dim=16, text_ff_size=32,
            text_num_heads=2, diffusion_steps=100, window_size=24,
        ))
        trainer = Trainer(cfg, clip_config=ClipTextConfig(width=32, heads=4, layers=2))
        state = trainer.init_state()
        tokens = jnp.asarray(
            np.random.default_rng(6).integers(0, 100, size=(2, 2, 77)), jnp.int32
        )
        lengths = jnp.asarray([20, 25], jnp.int32)
        rng = jax.random.key(7)
        common = dict(T=25, dim_pose=263, sampler="dpm", ddim_steps=8)
        out = make_sampler(trainer.model, trainer.sched, **common)(
            state.params, tokens, lengths, rng
        )
        assert out.shape == (2, 2, 25, 263)
        assert bool(jnp.all(jnp.isfinite(out)))
        out_nohoist = make_sampler(
            trainer.model, trainer.sched, **common, hoist_adaln=False
        )(state.params, tokens, lengths, rng)
        np.testing.assert_allclose(np.asarray(out), np.asarray(out_nohoist),
                                   rtol=2e-4, atol=2e-4)
