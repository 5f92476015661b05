"""--rms_norm: RMSNorm denoiser blocks (training-time architecture option).

A beat-the-reference perf lever: the DDIM scan body is latency-bound on the
~56 serialized norm reduce fusions (ROOFLINE.md device trace); RMSNorm drops
the mean subtraction and bias from each. The reference has LayerNorm only
(interaction_transformer.py:74,104-107). Quality evidence at experiment
scale: results/rms_run/ (five-metric eval vs the LayerNorm twin).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hig_tpu.config import ExperimentConfig, add_dataset_paths
from hig_tpu.models.text_encoder import ClipTextConfig


def tiny_cfg(tmp_path, **kw):
    return add_dataset_paths(ExperimentConfig(
        name="rms_tiny", dataset_name="synthetic_mul",
        data_root=str(tmp_path / "d"), checkpoints_dir=str(tmp_path / "c"),
        num_layers=2, latent_dim=32, ff_size=64, num_heads=4,
        num_text_layers=1, text_latent_dim=16, text_ff_size=32,
        text_num_heads=2, diffusion_steps=50, batch_size=4,
        window_size=24, rms_norm=True, **kw,
    ))


def make_trainer(cfg):
    from hig_tpu.train.trainer import Trainer

    return Trainer(cfg, clip_config=ClipTextConfig(width=32, heads=4, layers=2))


class TestRmsNorm:
    def test_param_tree_is_scale_only_in_denoiser(self, tmp_path):
        """Every norm under the denoiser blocks is RMSNorm (scale, no bias);
        the text tower keeps LayerNorm (CLIP weight portability)."""
        trainer = make_trainer(tiny_cfg(tmp_path))
        params = trainer.init_state().params["params"]
        flat = jax.tree_util.tree_flatten_with_path(params)[0]
        denoiser_norm_keys = set()
        text_norm_has_bias = False
        for path, _ in flat:
            keys = [getattr(k, "key", str(k)) for k in path]
            joined = "/".join(keys)
            # text_norm is excluded by design: it runs once per sampling
            # call (hoisted with the text KV), never in the scan body.
            if ("denoiser" in joined and "norm" in joined.lower()
                    and "text_norm" not in joined):
                denoiser_norm_keys.add(keys[-1])
            if joined.startswith("text/") and "ln_" in joined and keys[-1] == "bias":
                text_norm_has_bias = True
        assert "scale" in denoiser_norm_keys
        assert "bias" not in denoiser_norm_keys, denoiser_norm_keys
        assert text_norm_has_bias  # CLIP tower LN untouched

    def test_forward_train_step_and_sampler(self, tmp_path):
        """Init, one train step (VJP through RMSNorm), and the production
        sampler with and without the AdaLN hoist — all finite and agreeing."""
        from hig_tpu.train.trainer import make_sampler, make_train_step

        cfg = tiny_cfg(tmp_path, label_path="x")  # non-PIT supervised step
        trainer = make_trainer(cfg)
        state = trainer.init_state()
        rng = np.random.default_rng(0)
        batch = {
            "motion": jnp.asarray(rng.normal(size=(4, 2, 25, 263)), jnp.float32),
            "lengths": jnp.asarray(rng.integers(10, 26, size=(4,)), jnp.int32),
            "tokens": jnp.asarray(rng.integers(0, 100, size=(4, 2, 77)), jnp.int32),
        }
        step = jax.jit(make_train_step(
            trainer.model, trainer.sched, trainer.tx, pit=trainer.pit
        ))
        state2, metrics = step(state, batch, jax.random.key(1))
        assert np.isfinite(float(metrics["loss_mot_rec"]))

        tokens = batch["tokens"][:2]
        lengths = jnp.asarray([20, 25], jnp.int32)
        common = dict(T=25, dim_pose=263, sampler="ddim", ddim_steps=5)
        out = make_sampler(trainer.model, trainer.sched, **common)(
            state2.params, tokens, lengths, jax.random.key(2)
        )
        assert out.shape == (2, 2, 25, 263)
        assert bool(jnp.all(jnp.isfinite(out)))
        out_nohoist = make_sampler(
            trainer.model, trainer.sched, **common, hoist_adaln=False
        )(state2.params, tokens, lengths, jax.random.key(2))
        np.testing.assert_allclose(np.asarray(out), np.asarray(out_nohoist),
                                   rtol=2e-4, atol=2e-4)

    def test_refuses_no_eff_and_fused_blocks(self, tmp_path):
        for bad in (dict(no_eff=True), dict(fused_blocks=True)):
            trainer = make_trainer(tiny_cfg(tmp_path, **bad))
            with pytest.raises(ValueError, match="rms_norm"):
                trainer.init_state()

    def test_opt_txt_round_trip(self, tmp_path):
        from hig_tpu.config import load_opt_txt, save_opt_txt

        cfg = tiny_cfg(tmp_path)
        path = str(tmp_path / "opt.txt")
        save_opt_txt(cfg, path)
        loaded = load_opt_txt(path, is_train=True)
        assert loaded.rms_norm is True

    def test_norm_factory_math(self):
        """make_layer_norm(rms=True) is a genuine RMSNorm: not invariant to
        a constant input shift (LayerNorm is), and at init (scale=1) equals
        x / sqrt(mean(x^2) + eps). Together with the scale-only-param-tree
        test this pins that the flag actually changes the normalization."""
        from hig_tpu.models.embeddings import make_layer_norm

        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.normal(size=(3, 8)), jnp.float32)
        ln = make_layer_norm(jnp.float32)
        rms = make_layer_norm(jnp.float32, rms=True)
        p_ln = ln.init(jax.random.key(0), x)
        p_rms = rms.init(jax.random.key(0), x)
        np.testing.assert_allclose(
            np.asarray(ln.apply(p_ln, x + 5.0)), np.asarray(ln.apply(p_ln, x)),
            rtol=1e-4, atol=1e-4,
        )
        assert not np.allclose(
            np.asarray(rms.apply(p_rms, x + 5.0)), np.asarray(rms.apply(p_rms, x))
        )
        want = np.asarray(x) / np.sqrt(
            (np.asarray(x) ** 2).mean(-1, keepdims=True) + 1e-6
        )
        np.testing.assert_allclose(np.asarray(rms.apply(p_rms, x)), want,
                                   rtol=1e-4, atol=1e-4)
