"""Pipeline parallelism (parallel/pipeline.py) on the virtual CPU mesh.

The reference has no pipeline parallelism (SURVEY.md §2.6: "PP: absent").
These pin the GPipe engine's exactness: the staged schedule runs every
layer on the same inputs in the same order as the sequential stack, so the
pipelined denoiser must reproduce ``model.denoise`` — across stage counts,
microbatch counts, and composed with data parallelism on the same mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hig_tpu.config import MeshConfig
from hig_tpu.models.interaction_model import InteractionModel
from hig_tpu.parallel import pipeline as pp
from hig_tpu.train.trainer import Trainer

from tests.test_training import TINY_CLIP, tiny_cfg


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    cfg = tiny_cfg(str(tmp_path_factory.mktemp("pp")), cap_id=True,
                   mesh=MeshConfig(data=4, model=2))
    cfg.num_layers = 4
    trainer = Trainer(cfg, clip_config=TINY_CLIP)
    state = trainer.init_state()
    model, params = trainer.model, state.params
    B, T, D = 8, cfg.window_size + 1, cfg.dim_pose
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, 2, T, D), jnp.float32)
    t = jnp.asarray(rng.randint(0, 100, (B,)), jnp.int32)
    lengths = jnp.asarray([T, T - 3, 9, T, T, 12, T - 1, T], jnp.int32)
    cond = jnp.asarray(rng.randint(0, 43, (B, 2)), jnp.int32)
    xf_proj, xf_out = model.apply(
        params, cond, True, method=InteractionModel.encode_text
    )
    ref = model.apply(
        params, x, t, lengths, xf_proj, xf_out, True,
        method=InteractionModel.denoise,
    )
    return trainer, model, params, (x, t, lengths, xf_proj, xf_out), np.asarray(ref)


class TestPipelineParallel:
    @pytest.mark.parametrize("mesh_shape,n_micro", [
        ((4, 2), 2),   # 2 stages × 2 layers, DP4, 2 microbatches
        ((2, 4), 2),   # 4 stages × 1 layer (deep pipeline), DP2
        ((2, 4), 4),   # same, more microbatches than stages
    ])
    def test_matches_sequential_stack(self, setup, mesh_shape, n_micro):
        from hig_tpu.parallel import mesh as pmesh

        trainer, model, params, args, ref = setup
        x, t, lengths, xf_proj, xf_out = args
        mesh = pmesh.make_mesh(MeshConfig(data=mesh_shape[0],
                                          model=mesh_shape[1]))
        out = jax.jit(
            lambda p, xx: pp.pipeline_denoise(
                model, p, xx, t, lengths, xf_proj, xf_out,
                mesh, n_micro=n_micro,
            )
        )(params, x)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)

    def test_stage_params_are_sharded(self, setup):
        """The stacked layer params really live stage-sharded on the model
        axis inside the engine: the stacked tree's leading L axis divides
        into S stages."""
        trainer, model, params, _, _ = setup
        stacked = pp.stack_layer_params(
            params["params"]["denoiser"], model.num_layers
        )
        leaves = jax.tree_util.tree_leaves(stacked)
        assert all(leaf.shape[0] == model.num_layers for leaf in leaves)
        # place as the engine does and check the per-stage shard shape
        from jax.sharding import NamedSharding, PartitionSpec as P

        sh = NamedSharding(trainer.mesh, P("model"))
        leaf = jax.device_put(leaves[0], sh)
        S = trainer.mesh.shape["model"]
        shard_shapes = {s.data.shape for s in leaf.addressable_shards}
        assert shard_shapes == {(model.num_layers // S,) + leaves[0].shape[1:]}

    @pytest.mark.parametrize("flag", ["causal", "rms_norm"])
    def test_forwards_model_flags(self, flag, tmp_path):
        """pipeline_denoise must rebuild the layer module with the model's
        own causal/rms_norm (and use_pallas) flags — a --causal --pp_micro
        run would otherwise silently pipeline NON-causal attention, and
        --rms_norm would die on a param-tree mismatch."""
        from hig_tpu.parallel import mesh as pmesh

        cfg = tiny_cfg(str(tmp_path), cap_id=True,
                       mesh=MeshConfig(data=4, model=2))
        cfg.num_layers = 4
        setattr(cfg, flag, True)
        trainer = Trainer(cfg, clip_config=TINY_CLIP)
        state = trainer.init_state()
        model, params = trainer.model, state.params
        assert getattr(model, flag) is True
        B, T, D = 8, cfg.window_size + 1, cfg.dim_pose
        rng = np.random.RandomState(3)
        x = jnp.asarray(rng.randn(B, 2, T, D), jnp.float32)
        t = jnp.asarray(rng.randint(0, 100, (B,)), jnp.int32)
        lengths = jnp.asarray([T, T - 3, 9, T, T, 12, T - 1, T], jnp.int32)
        cond = jnp.asarray(rng.randint(0, 43, (B, 2)), jnp.int32)
        xf_proj, xf_out = model.apply(
            params, cond, True, method=InteractionModel.encode_text
        )
        ref = model.apply(
            params, x, t, lengths, xf_proj, xf_out, True,
            method=InteractionModel.denoise,
        )
        out = jax.jit(
            lambda p, xx: pp.pipeline_denoise(
                model, p, xx, t, lengths, xf_proj, xf_out,
                trainer.mesh, n_micro=2,
            )
        )(params, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_rejects_indivisible(self, setup):
        trainer, model, params, args, _ = setup
        x, t, lengths, xf_proj, xf_out = args
        with pytest.raises(ValueError, match="microbatch"):
            pp.pipeline_denoise(model, params, x, t, lengths, xf_proj,
                                xf_out, trainer.mesh, n_micro=3)


class TestPipelineTraining:
    """--pp_micro: the PIT train step under the GPipe schedule reproduces
    the plain (DP) step — same loss, same updated parameters — because the
    schedule is exact and ppermute/scan are differentiable."""

    def test_train_step_matches_dp(self, setup, tmp_path):
        from hig_tpu.train.trainer import Trainer, make_train_step

        trainer_dp, model, params, _, _ = setup
        cfg_pp = tiny_cfg(str(tmp_path), cap_id=True,
                          mesh=MeshConfig(data=4, model=2))
        cfg_pp.num_layers = 4
        cfg_pp.pp_micro = 2
        trainer_pp = Trainer(cfg_pp, clip_config=TINY_CLIP)
        assert trainer_pp.pp and trainer_pp.pit

        state = trainer_dp.init_state()
        B, T, D = 8, cfg_pp.window_size + 1, cfg_pp.dim_pose
        rng = np.random.RandomState(1)
        batch = {
            "motion": jnp.asarray(rng.randn(B, 2, T, D), jnp.float32),
            "lengths": jnp.asarray([T, T - 3, 9, T, T, 12, T - 1, T],
                                   jnp.int32),
            "cap_ids": jnp.asarray(rng.randint(0, 43, (B, 2)), jnp.int32),
        }
        step_rng = jax.random.key(7)

        step_dp = jax.jit(make_train_step(
            trainer_dp.model, trainer_dp.sched, trainer_dp.tx, pit=True))
        step_pp = jax.jit(make_train_step(
            trainer_pp.model, trainer_pp.sched, trainer_dp.tx, pit=True,
            pp_mesh=trainer_pp.mesh, pp_micro=2))

        s_dp, m_dp = step_dp(state, batch, step_rng)
        s_pp, m_pp = step_pp(trainer_pp.place_state(state), batch, step_rng)
        np.testing.assert_allclose(float(m_pp["loss_mot_rec"]),
                                   float(m_dp["loss_mot_rec"]), rtol=1e-5)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5),
            s_pp.params, s_dp.params,
        )

    def test_pp_excludes_fsdp_tp(self, setup, tmp_path):
        cfg = tiny_cfg(str(tmp_path / "x"), cap_id=True,
                       mesh=MeshConfig(data=4, model=2))
        cfg.pp_micro = 2
        cfg.fsdp = True
        with pytest.raises(ValueError, match="mutually exclusive"):
            Trainer(cfg, clip_config=TINY_CLIP)
        cfg.fsdp = False
        cfg.single_transformer = True
        with pytest.raises(ValueError, match="efficient"):
            Trainer(cfg, clip_config=TINY_CLIP)
