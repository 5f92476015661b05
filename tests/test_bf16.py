"""bf16 mixed-precision coverage (VERDICT r2 next #3).

The reference trains and samples in f32 only (no AMP anywhere in
codes/trainers/); hig_tpu's ``compute_dtype: bfloat16`` runs the model's
matmuls in bf16 while parameters and Adam state stay f32 — the standard
TPU mixed-precision recipe. These tests pin the semantics on the CPU
backend so the surface is exercised off-TPU too: parameter/optimizer
dtypes, finite losses, loss-curve agreement with f32 at small scale, and
the bf16 sampling path (params cast once per call, outputs finite).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hig_tpu.config import ExperimentConfig, add_dataset_paths
from hig_tpu.models.text_encoder import ClipTextConfig

TINY_CLIP = ClipTextConfig(width=32, heads=4, layers=2)


def tiny_cfg(tmp_root, **kw):
    cfg = ExperimentConfig(
        name="tiny_bf16", dataset_name="synthetic_mul",
        data_root=os.path.join(tmp_root, "data"),
        checkpoints_dir=os.path.join(tmp_root, "ckpt"),
        num_layers=2, latent_dim=32, ff_size=64, num_heads=4,
        num_text_layers=1, text_latent_dim=16, text_ff_size=32,
        text_num_heads=2, diffusion_steps=100, batch_size=8,
        log_every=2, save_latest=1000, window_size=24, **kw,
    )
    return add_dataset_paths(cfg)


def floating_dtypes(tree):
    return {
        str(l.dtype)
        for l in jax.tree_util.tree_leaves(tree)
        if jnp.issubdtype(l.dtype, jnp.floating)
    }


@pytest.fixture(scope="module")
def batches(synth_root):
    from hig_tpu.data.dataset import PairDataset, epoch_batches

    cfg = tiny_cfg(os.path.dirname(synth_root))
    cfg.data_root = synth_root
    mean = np.load(os.path.join(synth_root, "Mean.npy"))
    std = np.load(os.path.join(synth_root, "Std.npy"))
    ds = PairDataset(cfg, mean, std, "train_sub.txt", times=2)
    return list(epoch_batches(ds, 8, 0))


class TestBf16Training:
    def _run_steps(self, synth_root, tmp_path, batches, dtype_str, n_steps=6):
        from hig_tpu.train.trainer import Trainer, make_train_step

        cfg = tiny_cfg(str(tmp_path), compute_dtype=dtype_str)
        cfg.data_root = synth_root
        trainer = Trainer(cfg, clip_config=TINY_CLIP)
        state = trainer.init_state()
        tower_feats, _ = trainer.precompute_tower(state.params)
        step = jax.jit(
            make_train_step(trainer.model, trainer.sched, trainer.tx, pit=trainer.pit)
        )
        losses = []
        for i, batch in enumerate(batches[:n_steps]):
            dev = trainer._device_batch(batch, tower_feats)
            state, metrics = step(state, dev, jax.random.fold_in(jax.random.key(7), i))
            losses.append(float(metrics["loss_mot_rec"]))
        return state, losses

    def test_params_and_adam_stay_f32(self, synth_root, tmp_path, batches):
        state, losses = self._run_steps(synth_root, tmp_path, batches, "bfloat16")
        # mixed precision: master weights and optimizer moments are f32
        assert floating_dtypes(state.params) == {"float32"}
        assert floating_dtypes(state.opt_state) == {"float32"}
        assert all(np.isfinite(l) for l in losses)

    def test_loss_curve_tracks_f32(self, synth_root, tmp_path, batches):
        """Same data, same rng: the bf16 loss curve must track f32 within
        bf16 rounding noise — the stability evidence for mixed precision."""
        _, f32 = self._run_steps(synth_root, tmp_path / "f32", batches, "float32")
        _, bf16 = self._run_steps(synth_root, tmp_path / "bf16", batches, "bfloat16")
        np.testing.assert_allclose(np.asarray(bf16), np.asarray(f32), rtol=0.05)
        # and both actually decrease over the first steps
        assert f32[-1] < f32[0] and bf16[-1] < bf16[0]


class TestBf16Sampling:
    def test_sampler_casts_and_stays_finite(self, synth_root, tmp_path, batches):
        from hig_tpu.models.interaction_model import model_from_config
        from hig_tpu.train.trainer import Trainer, make_sampler

        cfg = tiny_cfg(str(tmp_path), compute_dtype="bfloat16")
        cfg.data_root = synth_root
        trainer = Trainer(cfg, clip_config=TINY_CLIP)
        state = trainer.init_state()
        assert trainer.model.dtype == jnp.bfloat16
        T = 25
        fn = make_sampler(trainer.model, trainer.sched, T=T, dim_pose=cfg.dim_pose,
                          sampler="ddim", ddim_steps=5)
        if cfg.cap_id:
            cond = jnp.zeros((2, 2), jnp.int32)
        else:
            from hig_tpu.models.tokenizer import tokenize
            from hig_tpu.data.vocab import CLASSID2CAPS

            c1, c2 = CLASSID2CAPS[2]
            cond = jnp.asarray(
                np.stack([np.stack([tokenize(c1)[0], tokenize(c2)[0]])] * 2)
            )
        out = fn(state.params, cond, jnp.full((2,), T, jnp.int32), jax.random.key(0))
        assert out.shape == (2, 2, T, cfg.dim_pose)
        assert np.isfinite(np.asarray(out, np.float32)).all()

    def test_fast_ln_same_tree_and_bf16_scale_deviation(self):
        """fast_ln keeps LayerNorm statistics in bf16 (flax promotes to f32
        by default). Parameter tree must be identical (checkpoints swap) and
        outputs must deviate only at bf16 rounding scale."""
        from hig_tpu.models.denoiser import InteractionDenoiser

        TINY = dict(input_feats=263, num_frames=32, latent_dim=32, ff_size=64,
                    num_layers=2, num_heads=4, text_latent_dim=16)
        B, T = 2, 12
        x = jax.random.normal(jax.random.key(0), (B, 2, T, 263))
        t = jnp.asarray([3, 7])
        lengths = jnp.asarray([T, 8])
        xf_proj = jax.random.normal(jax.random.key(1), (B, 2, 128))
        xf_out = jax.random.normal(jax.random.key(2), (B, 2, 7, 16))
        std = InteractionDenoiser(**TINY, dtype=jnp.bfloat16)
        fast = InteractionDenoiser(**TINY, dtype=jnp.bfloat16, fast_ln=True)
        params = std.init(jax.random.key(3), x, t, lengths, xf_proj, xf_out)
        assert (jax.tree_util.tree_structure(
                    fast.init(jax.random.key(3), x, t, lengths, xf_proj, xf_out))
                == jax.tree_util.tree_structure(params))
        leaves, tree = jax.tree_util.tree_flatten(params)
        keys = jax.random.split(jax.random.key(4), len(leaves))
        params = jax.tree_util.tree_unflatten(
            tree, [0.05 * jax.random.normal(k, l.shape, l.dtype)
                   for k, l in zip(keys, leaves)])
        a = np.asarray(std.apply(params, x, t, lengths, xf_proj, xf_out), np.float32)
        b = np.asarray(fast.apply(params, x, t, lengths, xf_proj, xf_out), np.float32)
        assert np.abs(a - b).max() < 0.05  # bf16 rounding, not divergence
        assert np.isfinite(b).all()

    def test_cast_floating_only_touches_floats(self):
        from hig_tpu.train.trainer import cast_floating

        tree = {"w": jnp.ones((2, 2), jnp.float32), "i": jnp.ones((2,), jnp.int32)}
        out = cast_floating(tree, jnp.bfloat16)
        assert out["w"].dtype == jnp.bfloat16
        assert out["i"].dtype == jnp.int32
