"""Tensor- and sequence-parallel sharding on the virtual 8-device CPU mesh.

The reference has no tensor, sequence, or pipeline parallelism at all —
its only strategy is DDP data parallelism (SURVEY.md §2.6: "TP: absent.
PP: absent. SP/CP: absent."). These tests cover the model-axis capabilities
``parallel/mesh.py`` adds beyond it:

* Megatron-style tensor parallelism (column-parallel QKV/FFN-in,
  row-parallel FFN-out): training-loss parity against pure DP, genuinely
  model-axis-sharded kernels and Adam state, and sampler output parity with
  TP-placed parameters.
* Sequence parallelism for the linear-attention denoiser: the time axis of
  the motion activations sharded over the model axis, with the K-softmax /
  KᵀV time reductions lowered to partial reductions + psum by GSPMD.
"""

import jax
import jax.numpy as jnp
import numpy as np

from hig_tpu.config import MeshConfig
from hig_tpu.models.interaction_model import InteractionModel
from hig_tpu.parallel import mesh as pmesh
from hig_tpu.train.trainer import Trainer, make_sampler, make_train_step

from tests.test_training import TINY_CLIP, tiny_cfg


def _batch(cfg):
    rng = np.random.RandomState(0)
    B, T, D = cfg.batch_size, cfg.window_size + 1, cfg.dim_pose
    return {
        "motion": rng.randn(B, 2, T, D).astype(np.float32),
        "lengths": np.full((B,), T, np.int32),
        "cap_ids": np.zeros((B, 2), np.int32),
    }


def _run_steps(cfg, n_steps=2):
    trainer = Trainer(cfg, clip_config=TINY_CLIP)
    state = trainer.init_state()
    step = jax.jit(
        make_train_step(
            trainer.model, trainer.sched, trainer.tx, pit=True,
            state_shardings=trainer._state_shardings(state),
        )
    )
    batch = pmesh.shard_batch(trainer.mesh, _batch(cfg))
    losses = []
    for i in range(n_steps):
        state, metrics = step(state, batch, jax.random.key(i))
        losses.append(float(metrics["loss_mot_rec"]))
    return trainer, state, losses


class TestTensorParallel:
    def test_tp_loss_matches_dp(self, tmp_path):
        """Two PIT train steps under 4x2 TP reproduce the 8x1 DP losses —
        the sharded program computes the same math (up to collective
        reduction order)."""
        cfg_dp = tiny_cfg(str(tmp_path / "dp"), cap_id=True,
                          mesh=MeshConfig(data=8, model=1))
        cfg_tp = tiny_cfg(str(tmp_path / "tp"), cap_id=True, tp=True,
                          mesh=MeshConfig(data=4, model=2))
        _, _, losses_dp = _run_steps(cfg_dp)
        _, _, losses_tp = _run_steps(cfg_tp)
        np.testing.assert_allclose(losses_tp, losses_dp, rtol=2e-4, atol=1e-6)

    def test_tp_kernels_and_adam_state_sharded(self, tmp_path):
        """QKV/linear1 kernels are column-sharded, linear2 row-sharded, the
        rest replicated — and Adam's mu mirrors the kernel sharding, on the
        post-step state (the with_sharding_constraint target holds)."""
        cfg = tiny_cfg(str(tmp_path), cap_id=True, tp=True,
                       mesh=MeshConfig(data=4, model=2))
        _, state, _ = _run_steps(cfg, n_steps=1)

        def spec_of(x):
            return tuple(getattr(x.sharding, "spec", ()))

        col = row = mu_sharded = 0
        for path, leaf in jax.tree_util.tree_flatten_with_path(state.params)[0]:
            names = pmesh._path_names(path)
            if names[-1] != "kernel" or getattr(leaf, "ndim", 0) != 2:
                continue
            spec = spec_of(leaf)
            if names[-2] in ("query", "key", "value", "linear1"):
                if leaf.shape[1] % 2 == 0:
                    assert len(spec) >= 2 and spec[1] == "model", (names, spec)
                    col += 1
            elif names[-2] == "linear2":
                if leaf.shape[0] % 2 == 0:
                    assert len(spec) >= 1 and spec[0] == "model", (names, spec)
                    row += 1
            else:
                assert "model" not in spec, (names, spec)
        for path, leaf in jax.tree_util.tree_flatten_with_path(state.opt_state)[0]:
            names = pmesh._path_names(path)
            if "mu" in names and names[-1] == "kernel" and "model" in str(
                spec_of(leaf)
            ):
                mu_sharded += 1
        assert col > 0 and row > 0, (col, row)
        assert mu_sharded > 0

    def test_tp_sampler_parity(self, tmp_path):
        """DDIM sampling with TP-placed params matches replicated params —
        serving can shard the denoiser weights without touching the sampler."""
        cfg = tiny_cfg(str(tmp_path), cap_id=True, tp=True,
                       mesh=MeshConfig(data=4, model=2))
        trainer = Trainer(cfg, clip_config=TINY_CLIP)
        state = trainer.init_state()  # TP-placed by place_state
        params_rep = jax.device_put(
            jax.device_get(state.params), pmesh.replicated(trainer.mesh)
        )
        T = cfg.window_size + 1
        sample = make_sampler(trainer.model, trainer.sched, T, cfg.dim_pose,
                              sampler="ddim", ddim_steps=5)
        cond = jnp.zeros((4, 2), jnp.int32)
        lengths = jnp.full((4,), T, jnp.int32)
        out_tp = sample(state.params, cond, lengths, jax.random.key(3))
        out_rep = sample(params_rep, cond, lengths, jax.random.key(3))
        np.testing.assert_allclose(
            np.asarray(out_tp), np.asarray(out_rep), rtol=2e-4, atol=2e-5
        )


class TestSequenceParallel:
    def test_t_sharded_denoise_matches_replicated(self, tmp_path):
        """One denoiser call with the motion's T axis sharded over the model
        axis reproduces the replicated result — GSPMD lowers the linear
        attention's time reductions to partial sums + psum. (device_put
        needs the sharded dim divisible by the axis size, so window 25 →
        T=26; ragged lengths still exercise the masking.)"""
        cfg = tiny_cfg(str(tmp_path), cap_id=True,
                       mesh=MeshConfig(data=4, model=2))
        cfg.window_size = 25
        trainer = Trainer(cfg, clip_config=TINY_CLIP)
        state = trainer.init_state()
        model, params = trainer.model, state.params
        B, T, D = 4, cfg.window_size + 1, cfg.dim_pose
        x = jnp.asarray(np.random.RandomState(1).randn(B, 2, T, D), jnp.float32)
        t = jnp.full((B,), 7, jnp.int32)
        lengths = jnp.asarray([T, T - 5, T, 9], jnp.int32)
        cond = jnp.zeros((B, 2), jnp.int32)
        xf_proj, xf_out = model.apply(
            params, cond, True, method=InteractionModel.encode_text
        )

        @jax.jit
        def denoise(x):
            return model.apply(
                params, x, t, lengths, xf_proj, xf_out, True,
                method=InteractionModel.denoise,
            )

        y_rep = denoise(jax.device_put(x, pmesh.replicated(trainer.mesh)))
        x_sp = jax.device_put(x, pmesh.sequence_sharding(trainer.mesh))
        assert x_sp.sharding.spec[2] == "model"
        y_sp = denoise(x_sp)
        np.testing.assert_allclose(
            np.asarray(y_sp), np.asarray(y_rep), rtol=2e-4, atol=2e-5
        )


class TestTpFsdpExclusion:
    def test_both_flags_raise(self, tmp_path):
        import pytest

        cfg = tiny_cfg(str(tmp_path), tp=True, fsdp=True,
                       mesh=MeshConfig(data=4, model=2))
        with pytest.raises(ValueError, match="model axis"):
            Trainer(cfg, clip_config=TINY_CLIP)
