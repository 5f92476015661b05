"""Behavioral tests for the model zoo (denoisers, text encoder, evaluators).

The reference has only an eyeball smoke block
(interaction_transformer.py:831-855) checking mask invariance; these tests
make that property (and several structural ones) executable.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hig_tpu.models.denoiser import InteractionDenoiser, MotionDenoiser
from hig_tpu.models.eval_models import MotionConsistencyEvalModel, MotionEncoder
from hig_tpu.models.text_encoder import ClassConditioner, ClipTextConfig, TextEncoder
from hig_tpu.models.tokenizer import CONTEXT_LENGTH, EOT, SOT, tokenize

TINY = dict(
    input_feats=263, num_frames=32, latent_dim=32, ff_size=64,
    num_layers=2, num_heads=4, text_latent_dim=16,
)
TINY_CLIP = ClipTextConfig(vocab_size=49408, context_length=77, width=32, heads=4, layers=2)


def _text_cond(B, key, time_embed_dim=128, text_latent_dim=16, L=7):
    k1, k2 = jax.random.split(key)
    xf_proj = jax.random.normal(k1, (B, 2, time_embed_dim))
    xf_out = jax.random.normal(k2, (B, 2, L, text_latent_dim))
    return xf_proj, xf_out


class TestTokenizer:
    def test_layout(self):
        toks = tokenize(["A person is pushing the other person."])
        assert toks.shape == (1, CONTEXT_LENGTH)
        assert toks[0, 0] == SOT
        assert EOT in toks[0]
        assert toks[0].argmax() == list(toks[0]).index(EOT)

    def test_deterministic_and_distinct(self):
        a = tokenize("A person is pushing the other person.")
        b = tokenize("A person is pushing the other person.")
        c = tokenize("A person is pushed by the other person.")
        np.testing.assert_array_equal(a, b)
        assert not np.array_equal(a, c)

    def test_truncation(self):
        toks = tokenize("word " * 200)
        assert toks.shape == (1, CONTEXT_LENGTH)
        assert toks[0, -1] == EOT


@pytest.fixture(scope="module")
def interaction_model():
    model = InteractionDenoiser(**TINY)
    B, T = 2, 24
    x = jax.random.normal(jax.random.key(0), (B, 2, T, 263))
    t = jnp.asarray([10, 500])
    lengths = jnp.asarray([T, 17])
    xf_proj, xf_out = _text_cond(B, jax.random.key(1))
    params = model.init(jax.random.key(2), x, t, lengths, xf_proj, xf_out)
    return model, params, (x, t, lengths, xf_proj, xf_out)


class TestInteractionDenoiser:
    def test_zero_at_init(self, interaction_model):
        """Zero-init output heads ⇒ exact zero prediction at init."""
        model, params, args = interaction_model
        out = model.apply(params, *args)
        assert out.shape == args[0].shape
        np.testing.assert_array_equal(np.asarray(out), 0.0)

    def _random_params(self, model, args):
        params = model.init(jax.random.key(3), *args)
        # randomize all weights incl. zero-init heads so behavior is nontrivial
        leaves, tree = jax.tree_util.tree_flatten(params)
        keys = jax.random.split(jax.random.key(4), len(leaves))
        leaves = [
            0.02 * jax.random.normal(k, l.shape, l.dtype) for k, l in zip(keys, leaves)
        ]
        return jax.tree_util.tree_unflatten(tree, leaves)

    def test_mask_invariance(self, interaction_model):
        """Padded vs truncated inputs agree on the valid region.

        (executable version of the reference smoke block, :831-855)
        """
        model, _, (x, t, lengths, xf_proj, xf_out) = interaction_model
        params = self._random_params(model, (x, t, lengths, xf_proj, xf_out))
        L = 17
        lengths = jnp.asarray([L, L])
        full = model.apply(params, x, t, lengths, xf_proj, xf_out)
        trunc = model.apply(params, x[:, :, :L], t, lengths, xf_proj, xf_out)
        np.testing.assert_allclose(
            np.asarray(full[:, :, :L]), np.asarray(trunc), atol=1e-5
        )

    def test_actor_swap_equivariance(self, interaction_model):
        """Swapping actors (and their captions) swaps the prediction."""
        model, _, (x, t, lengths, xf_proj, xf_out) = interaction_model
        params = self._random_params(model, (x, t, lengths, xf_proj, xf_out))
        out = model.apply(params, x, t, lengths, xf_proj, xf_out)
        out_sw = model.apply(
            params,
            jnp.flip(x, 1), t, lengths, jnp.flip(xf_proj, 1), jnp.flip(xf_out, 1),
        )
        np.testing.assert_allclose(
            np.asarray(out_sw), np.asarray(jnp.flip(out, 1)), atol=1e-5
        )

    @pytest.mark.parametrize("efficient", [True, False])
    def test_text_kv_hoist_matches_direct(self, interaction_model, efficient):
        """Precomputed per-layer text-KV (the sampling-scan hoist) must be
        numerically identical to recomputing text K/V inside the call."""
        model, _, (x, t, lengths, xf_proj, xf_out) = interaction_model
        if not efficient:
            model = InteractionDenoiser(**{**TINY, "efficient": False})
        params = self._random_params(model, (x, t, lengths, xf_proj, xf_out))
        direct = model.apply(params, x, t, lengths, xf_proj, xf_out)
        kv = model.apply(params, xf_out, method=InteractionDenoiser.text_kv)
        hoisted = model.apply(params, x, t, lengths, xf_proj, None, text_kv=kv)
        np.testing.assert_allclose(np.asarray(hoisted), np.asarray(direct), atol=1e-6)

    def test_adaln_grid_hoist_matches_direct(self, interaction_model):
        """adaln_scale_shift_grid (the sampler's out-of-loop AdaLN hoist, a
        pure function over the raw param tree) must reproduce the in-loop
        time-embed + StylizationBlock projections exactly: denoise with a
        per-step slice of the grid == denoise computing emb in-loop."""
        from hig_tpu.train.trainer import adaln_scale_shift_grid

        model, params, (x, t, lengths, xf_proj, xf_out) = interaction_model
        # denoiser timesteps are shared per batch in sampling
        t_shared = jnp.full_like(t, int(t[0]))
        want = model.apply(params, x, t_shared, lengths, xf_proj, xf_out)

        ts = np.asarray([int(t[0]), 5])  # step 0 of the grid == t_shared
        fake_params = {"params": {"denoiser": params["params"]}}
        stub = type("M", (), {"dtype": model.dtype, "latent_dim": model.latent_dim,
                              "single_transformer": False})()
        grid = adaln_scale_shift_grid(stub, fake_params, ts, xf_proj)
        step0 = tuple(
            {k: (s[0], sh[0]) for k, (s, sh) in layer.items()} for layer in grid
        )
        got = model.apply(params, x, t_shared, lengths, xf_proj, xf_out,
                          adaln=step0)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)

    def test_quadratic_variant_runs(self):
        model = InteractionDenoiser(**{**TINY, "efficient": False})
        B, T = 2, 12
        x = jax.random.normal(jax.random.key(0), (B, 2, T, 263))
        t = jnp.asarray([3, 7])
        lengths = jnp.asarray([T, 9])
        xf_proj, xf_out = _text_cond(B, jax.random.key(1))
        params = model.init(jax.random.key(2), x, t, lengths, xf_proj, xf_out)
        out = model.apply(params, x, t, lengths, xf_proj, xf_out)
        assert out.shape == x.shape and np.isfinite(np.asarray(out)).all()

    def test_no_interaction_ablation(self):
        model = InteractionDenoiser(**{**TINY, "interaction": False})
        B, T = 1, 8
        x = jax.random.normal(jax.random.key(0), (B, 2, T, 263))
        args = (x, jnp.asarray([5]), jnp.asarray([T]), *_text_cond(B, jax.random.key(1)))
        params = model.init(jax.random.key(2), *args)
        assert "int_ca_block" not in str(jax.tree_util.tree_structure(params))
        out = model.apply(params, *args)
        assert out.shape == x.shape


class TestMotionDenoiser:
    def test_shapes_and_zero_init(self):
        model = MotionDenoiser(**TINY)
        B, T = 3, 16
        x = jax.random.normal(jax.random.key(0), (B, T, 263))
        t = jnp.asarray([1, 2, 3])
        lengths = jnp.asarray([16, 10, 4])
        xf_proj = jax.random.normal(jax.random.key(1), (B, 128))
        xf_out = jax.random.normal(jax.random.key(2), (B, 7, 16))
        params = model.init(jax.random.key(3), x, t, lengths, xf_proj, xf_out)
        out = model.apply(params, x, t, lengths, xf_proj, xf_out)
        assert out.shape == x.shape
        np.testing.assert_array_equal(np.asarray(out), 0.0)


class TestTextEncoder:
    def test_shapes(self):
        enc = TextEncoder(clip_config=TINY_CLIP, text_latent_dim=16, text_ff_size=32,
                          num_text_layers=2, time_embed_dim=128)
        toks = jnp.asarray(tokenize(["a person pushes", "a person is pushed"]))
        params = enc.init(jax.random.key(0), toks)
        xf_proj, xf_out = enc.apply(params, toks)
        assert xf_proj.shape == (2, 128)
        assert xf_out.shape == (2, 77, 16)

    def test_clip_tower_gets_no_gradient(self):
        enc = TextEncoder(clip_config=TINY_CLIP, text_latent_dim=16, text_ff_size=32,
                          num_text_layers=2, time_embed_dim=128)
        toks = jnp.asarray(tokenize(["hello"]))
        params = enc.init(jax.random.key(0), toks)

        def loss(p):
            xf_proj, _ = enc.apply(p, toks)
            return jnp.sum(xf_proj**2)

        grads = jax.grad(loss)(params)
        clip_grads = grads["params"]["clip"]
        total = sum(float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(clip_grads))
        assert total == 0.0
        suffix_grads = grads["params"]["text_proj"]
        assert sum(float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(suffix_grads)) > 0

    def test_class_conditioner(self):
        cond = ClassConditioner(num_captions=43, text_latent_dim=16, time_embed_dim=128)
        ids = jnp.asarray([0, 42, 7])
        params = cond.init(jax.random.key(0), ids)
        xf_proj, xf_out = cond.apply(params, ids)
        assert xf_proj.shape == (3, 128)
        assert xf_out.shape == (3, 1, 16)


class TestEvalModels:
    def test_motion_encoder(self):
        model = MotionEncoder(input_feats=259, num_frames=32, latent_dim=32,
                              ff_size=64, num_layers=2, num_heads=4)
        x = jax.random.normal(jax.random.key(0), (2, 2, 16, 259))
        lengths = jnp.asarray([16, 9])
        params = model.init(jax.random.key(1), x, lengths)
        logits, emb = model.apply(params, x, lengths)
        assert logits.shape == (2, 26)
        assert emb.shape == (2, 32)

    def test_motion_encoder_mask_invariance(self):
        model = MotionEncoder(input_feats=259, num_frames=32, latent_dim=32,
                              ff_size=64, num_layers=2, num_heads=4)
        x = jax.random.normal(jax.random.key(0), (1, 2, 16, 259))
        L = 9
        params = model.init(jax.random.key(1), x, jnp.asarray([16]))
        logits_pad, emb_pad = model.apply(params, x, jnp.asarray([L]))
        logits_cut, emb_cut = model.apply(params, x[:, :, :L], jnp.asarray([L]))
        np.testing.assert_allclose(np.asarray(emb_pad), np.asarray(emb_cut), atol=1e-5)
        np.testing.assert_allclose(np.asarray(logits_pad), np.asarray(logits_cut), atol=1e-5)

    def test_consistency_model(self):
        model = MotionConsistencyEvalModel(input_feats=259, num_frames=32, latent_dim=32,
                                           ff_size=64, num_layers=2, num_heads=4)
        x = jax.random.normal(jax.random.key(0), (3, 2, 16, 259))
        lengths = jnp.asarray([16, 8, 12])
        params = model.init(jax.random.key(1), x, lengths)
        logits = model.apply(params, x, lengths)
        assert logits.shape == (3, 2)


class TestCausalAndBaseline:
    """--causal and --single_transformer: parsed-but-dead flags in the
    reference (base_options.py:19,21); real semantics here."""

    def _random_params(self, model, args):
        params = model.init(jax.random.key(3), *args)
        leaves, tree = jax.tree_util.tree_flatten(params)
        keys = jax.random.split(jax.random.key(4), len(leaves))
        leaves = [
            0.02 * jax.random.normal(k, l.shape, l.dtype) for k, l in zip(keys, leaves)
        ]
        return jax.tree_util.tree_unflatten(tree, leaves)

    def _args(self, B=2, T=12):
        x = jax.random.normal(jax.random.key(0), (B, 2, T, 263))
        t = jnp.asarray([3, 7])[:B]
        lengths = jnp.full((B,), T)
        xf_proj, xf_out = _text_cond(B, jax.random.key(1))
        return x, t, lengths, xf_proj, xf_out

    @pytest.mark.parametrize("efficient", [True, False])
    def test_causal_no_future_dependence(self, efficient):
        """Perturbing frame k must not change predictions at frames < k."""
        model = InteractionDenoiser(**{**TINY, "efficient": efficient, "causal": True})
        x, t, lengths, xf_proj, xf_out = self._args()
        params = self._random_params(model, (x, t, lengths, xf_proj, xf_out))
        out = model.apply(params, x, t, lengths, xf_proj, xf_out)
        k = 8
        x2 = x.at[:, :, k:].add(3.0)  # perturb the future of BOTH actors
        out2 = model.apply(params, x2, t, lengths, xf_proj, xf_out)
        np.testing.assert_allclose(
            np.asarray(out[:, :, :k]), np.asarray(out2[:, :, :k]), atol=1e-5
        )
        # and the perturbation does change the future (sanity)
        assert np.abs(np.asarray(out[:, :, k:] - out2[:, :, k:])).max() > 1e-4

    def test_non_causal_sees_future(self):
        model = InteractionDenoiser(**TINY)
        x, t, lengths, xf_proj, xf_out = self._args()
        params = self._random_params(model, (x, t, lengths, xf_proj, xf_out))
        out = model.apply(params, x, t, lengths, xf_proj, xf_out)
        out2 = model.apply(params, x.at[:, :, 8:].add(3.0), t, lengths, xf_proj, xf_out)
        # tiny 0.02-scale random weights leak only weakly, but measurably
        assert np.abs(np.asarray(out[:, :, :8] - out2[:, :, :8])).max() > 1e-5

    def test_single_transformer_baseline(self):
        """Baseline layer stack: no interaction-attention params, but the
        actors still couple through the merged 2T-token self-attention."""
        model = InteractionDenoiser(**{**TINY, "single_transformer": True})
        x, t, lengths, xf_proj, xf_out = self._args()
        params = self._random_params(model, (x, t, lengths, xf_proj, xf_out))
        assert "int_ca_block" not in str(jax.tree_util.tree_structure(params))
        out = model.apply(params, x, t, lengths, xf_proj, xf_out)
        assert out.shape == x.shape and np.isfinite(np.asarray(out)).all()
        # coupling: perturbing actor 1 changes actor 0's prediction (weakly
        # at 0.02-scale random weights, but well above float noise — compare
        # the fully-decoupled no_cross_attn case, exact to 1e-5 below)
        out2 = model.apply(params, x.at[:, 1].add(1.0), t, lengths, xf_proj, xf_out)
        assert np.abs(np.asarray(out[:, 0] - out2[:, 0])).max() > 1e-5
        # hoisted text-KV path matches the direct call
        kv = model.apply(params, xf_out, method=InteractionDenoiser.text_kv)
        hoisted = model.apply(params, x, t, lengths, xf_proj, None, text_kv=kv)
        np.testing.assert_allclose(np.asarray(hoisted), np.asarray(out), atol=1e-6)

    def test_causal_plus_single_transformer_refused(self):
        """The merged-2T baseline has no consistent temporal order, so a
        causal mask over it is not temporal causality — the combination must
        raise instead of silently computing wrong semantics (ADVICE r2)."""
        model = InteractionDenoiser(
            **{**TINY, "single_transformer": True, "causal": True}
        )
        x, t, lengths, xf_proj, xf_out = self._args()
        with pytest.raises(ValueError, match="single_transformer"):
            model.init(jax.random.key(0), x, t, lengths, xf_proj, xf_out)

    def test_no_cross_attn_does_not_couple(self):
        """Contrast with --no_cross_attn: actors are fully independent."""
        model = InteractionDenoiser(**{**TINY, "interaction": False})
        x, t, lengths, xf_proj, xf_out = self._args()
        params = self._random_params(model, (x, t, lengths, xf_proj, xf_out))
        out = model.apply(params, x, t, lengths, xf_proj, xf_out)
        out2 = model.apply(params, x.at[:, 1].add(1.0), t, lengths, xf_proj, xf_out)
        np.testing.assert_allclose(
            np.asarray(out[:, 0]), np.asarray(out2[:, 0]), atol=1e-5
        )


class TestClipBPEMachinery:
    """Validates the from-scratch BPE implementation's merge logic on a
    synthetic merges file in the exact format of CLIP's
    bpe_simple_vocab_16e6.txt.gz — so when the real asset lands, only data
    changes, not code (VERDICT r1 next #4)."""

    def _tiny_tokenizer(self, tmp_path):
        import gzip

        from hig_tpu.models.tokenizer import ClipBPETokenizer

        merges = "#version: 0.2\nh e\nhe l\nl o</w>\n"
        p = tmp_path / "bpe_tiny.txt.gz"
        with gzip.open(p, "wt") as f:
            f.write(merges)
        return ClipBPETokenizer(str(p))

    def test_merge_order_and_ids(self, tmp_path):
        tok = self._tiny_tokenizer(tmp_path)
        # 'hello' → h+e → he+l → (l,o</w>) → ['hel', 'lo</w>']
        assert tok._bpe("hello") == "hel lo</w>"
        # vocab layout: 256 bytes + 256 byte</w> + merges in rank order
        assert tok.encoder["he"] == 512
        assert tok.encoder["hel"] == 513
        assert tok.encoder["lo</w>"] == 514
        assert tok.encode("hello") == [513, 514]
        # unknown pairs stop merging; singles fall back to byte ids
        assert tok._bpe("eh") == "e h</w>"

    def test_lowercase_and_whitespace_cleanup(self, tmp_path):
        tok = self._tiny_tokenizer(tmp_path)
        assert tok.encode("  HELLO\n hello ") == [513, 514, 513, 514]

    def test_tokenize_uses_bpe_when_asset_present(self, tmp_path, monkeypatch):
        import gzip

        from hig_tpu.models import tokenizer as T

        merges = "#version: 0.2\nh e\nhe l\nl o</w>\n"
        p = tmp_path / "bpe_tiny.txt.gz"
        with gzip.open(p, "wt") as f:
            f.write(merges)
        monkeypatch.setenv("HIG_TPU_BPE_PATH", str(p))
        monkeypatch.setattr(T, "_DEFAULT_ASSET_PATHS", [str(p)])
        T.default_tokenizer.cache_clear()
        try:
            ids = T.tokenize("hello")
            assert ids[0, 0] == T.SOT
            assert list(ids[0, 1:3]) == [513, 514]
            assert ids[0, 3] == T.EOT
        finally:
            T.default_tokenizer.cache_clear()


class TestLazyKnorm:
    def test_lazy_knorm_is_exact(self):
        """The layout-experiment rewrite (normalize after the T-contraction,
        attention.LAZY_KNORM) is the same math as the K time-softmax —
        z is independent of the contracted axis, so dividing the contracted
        state equals contracting the normalized tensor."""
        from hig_tpu.models import attention as attn

        rng = np.random.RandomState(0)
        q = jnp.asarray(rng.randn(3, 2, 17, 64), jnp.float32)
        k = jnp.asarray(rng.randn(3, 2, 17, 64), jnp.float32)
        v = jnp.asarray(rng.randn(3, 2, 17, 64), jnp.float32)
        mask = jnp.asarray(rng.rand(3, 2, 17) > 0.3, jnp.float32)
        base = attn.efficient_attention(q, k, v, 4, mask)
        try:
            attn.LAZY_KNORM = True
            lazy = attn.efficient_attention(q, k, v, 4, mask)
        finally:
            attn.LAZY_KNORM = False
        np.testing.assert_allclose(np.asarray(lazy), np.asarray(base),
                                   rtol=2e-5, atol=2e-6)
