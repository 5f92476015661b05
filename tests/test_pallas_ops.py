"""Parity tests for the Pallas fused attention kernel (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hig_tpu.models.attention import efficient_attention
from hig_tpu.ops.pallas_attention import fused_efficient_attention


def _rand(*shape, key=0):
    return jax.random.normal(jax.random.key(key), shape, jnp.float32)


class TestFusedEfficientAttention:
    @pytest.mark.parametrize("Tq,Tk", [(16, 16), (24, 8)])
    def test_matches_einsum_path(self, Tq, Tk):
        B, H, D = 3, 4, 32
        q, k, v = _rand(B, Tq, D, key=0), _rand(B, Tk, D, key=1), _rand(B, Tk, D, key=2)
        mask = (jnp.arange(Tk) < jnp.asarray([[Tk], [Tk // 2], [3]])).astype(jnp.float32)
        want = efficient_attention(q, k, v, H, key_mask=mask)
        got = fused_efficient_attention(q, k, v, H, key_mask=mask, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

    def test_no_mask(self):
        B, T, D, H = 2, 12, 16, 4
        q, k, v = _rand(B, T, D, key=3), _rand(B, T, D, key=4), _rand(B, T, D, key=5)
        want = efficient_attention(q, k, v, H)
        got = fused_efficient_attention(q, k, v, H, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

    def test_actor_axis_layout(self):
        """(B, 2, T, D) leading dims flatten correctly."""
        B, T, D, H = 2, 10, 16, 4
        q = _rand(B, 2, T, D, key=6)
        k = _rand(B, 2, T, D, key=7)
        v = _rand(B, 2, T, D, key=8)
        mask = jnp.ones((B, 2, T))
        want = efficient_attention(q, k, v, H, key_mask=mask)
        got = fused_efficient_attention(q, k, v, H, key_mask=mask, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

    def test_gradients_match_einsum_path(self):
        B, T, D, H = 2, 8, 16, 4
        q, k, v = _rand(B, T, D, key=9), _rand(B, T, D, key=10), _rand(B, T, D, key=11)
        mask = (jnp.arange(T) < 5).astype(jnp.float32)[None].repeat(B, 0)

        def loss_ref(q, k, v):
            return jnp.sum(efficient_attention(q, k, v, H, key_mask=mask) ** 2)

        def loss_fused(q, k, v):
            return jnp.sum(
                fused_efficient_attention(q, k, v, H, key_mask=mask, interpret=True) ** 2
            )

        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g_ref, g_fused):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-5)


class TestFlashAttention:
    """Tiled flash kernel vs the einsum quadratic path (interpret mode)."""

    def _qkv(self, N=3, Tq=37, Tk=29, H=4, hd=16, seed=0):
        ks = jax.random.split(jax.random.key(seed), 3)
        q = jax.random.normal(ks[0], (N, Tq, H * hd))
        k = jax.random.normal(ks[1], (N, Tk, H * hd))
        v = jax.random.normal(ks[2], (N, Tk, H * hd))
        return q, k, v

    def test_matches_quadratic_unmasked(self):
        from hig_tpu.models.attention import quadratic_attention
        from hig_tpu.ops.flash_attention import flash_attention

        q, k, v = self._qkv()
        want = quadratic_attention(q, k, v, 4)
        got = flash_attention(q, k, v, 4, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

    def test_matches_quadratic_masked(self):
        from hig_tpu.models.attention import quadratic_attention
        from hig_tpu.ops.flash_attention import flash_attention

        q, k, v = self._qkv()
        lengths = jnp.asarray([29, 11, 3])
        mask = (jnp.arange(29) < lengths[:, None]).astype(jnp.float32)
        bias = (1.0 - mask)[:, None, :, None] * -1000000.0
        want = quadratic_attention(q, k, v, 4, logit_bias=bias)
        got = flash_attention(q, k, v, 4, key_mask=mask, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

    def test_causal(self):
        from hig_tpu.models.attention import causal_bias, quadratic_attention
        from hig_tpu.ops.flash_attention import flash_attention

        q, k, v = self._qkv(Tq=21, Tk=21)
        want = quadratic_attention(
            q, k, v, 4, logit_bias=causal_bias(21, jnp.float32)
        )
        got = flash_attention(q, k, v, 4, causal=True, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

    def test_tiling_covers_multiple_key_blocks(self):
        """Tk > BK exercises the online-softmax recurrence across blocks."""
        from hig_tpu.models.attention import quadratic_attention
        from hig_tpu.ops.flash_attention import flash_attention
        from hig_tpu.ops import flash_attention as FA

        q, k, v = self._qkv(N=2, Tq=160, Tk=300, H=2, hd=8, seed=1)
        want = quadratic_attention(q, k, v, 2)
        got = FA.flash_attention(q, k, v, 2, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)

    def test_gradients_match_einsum(self):
        from hig_tpu.models.attention import quadratic_attention
        from hig_tpu.ops.flash_attention import flash_attention

        q, k, v = self._qkv(N=2, Tq=13, Tk=13, H=2, hd=8, seed=2)
        mask = jnp.ones((2, 13))

        def f_flash(q, k, v):
            return jnp.sum(flash_attention(q, k, v, 2, key_mask=mask, interpret=True) ** 2)

        def f_ref(q, k, v):
            bias = (1.0 - mask)[:, None, :, None] * -1000000.0
            return jnp.sum(quadratic_attention(q, k, v, 2, logit_bias=bias) ** 2)

        g1 = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
        g2 = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)

    def test_quadratic_block_uses_kernel(self):
        """QuadraticSelfAttention(use_pallas=True) matches the einsum block."""
        from hig_tpu.models.attention import QuadraticSelfAttention

        B, T, D = 2, 18, 32
        x = jax.random.normal(jax.random.key(0), (B, 2, T, D))
        emb = jax.random.normal(jax.random.key(1), (B, 2, 128))
        lengths = jnp.asarray([T, 9])
        mask = (jnp.arange(T) < lengths[:, None]).astype(jnp.float32)[:, None, :]
        ref_block = QuadraticSelfAttention(D, 4)
        params = ref_block.init(jax.random.key(2), x, emb, mask)
        want = ref_block.apply(params, x, emb, mask)
        got = QuadraticSelfAttention(D, 4, use_pallas=True).apply(params, x, emb, mask)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


class TestFusedBlock:
    """Monolithic fused attention-block kernel vs the flax block
    (interpret mode)."""

    def _setup(self, T=24, D=32, H=4, B=3):
        from hig_tpu.models.attention import EfficientSelfAttention

        block = EfficientSelfAttention(D, H)
        x = jax.random.normal(jax.random.key(0), (B, 2, T, D))
        emb = jax.random.normal(jax.random.key(1), (B, 2, 4 * D))
        lengths = jnp.asarray([T, T - 7, 5])
        mask = (jnp.arange(T) < lengths[:, None]).astype(jnp.float32)[:, None, :]
        variables = block.init(jax.random.key(2), x, emb, mask)
        # randomize the zero-init output head so the test is nontrivial
        p = jax.tree_util.tree_map(lambda a: a, variables["params"])
        p["proj_out"]["out"]["kernel"] = 0.1 * jax.random.normal(
            jax.random.key(3), p["proj_out"]["out"]["kernel"].shape
        )
        return block, {"params": p}, x, emb, mask

    def test_matches_flax_block(self):
        from hig_tpu.ops.fused_block import fused_attention_block

        block, variables, x, emb, mask = self._setup()
        want = block.apply(variables, x, emb, mask)

        p = variables["params"]
        # AdaLN scale/shift from the emb projection (computed outside the kernel)
        emb_out = jax.nn.silu(emb) @ p["proj_out"]["emb"]["kernel"] + p["proj_out"]["emb"]["bias"]
        scale, shift = jnp.split(emb_out, 2, axis=-1)
        bmask = jnp.broadcast_to(mask, x.shape[:-1])
        got = fused_attention_block(
            x, x, bmask, scale, shift, p, num_heads=4, interpret=True
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

    def test_interaction_variant(self):
        """kv from the flipped actor axis reproduces the interaction block."""
        from hig_tpu.models.attention import EfficientInteractionAttention
        from hig_tpu.ops.fused_block import fused_attention_block

        T, D, H, B = 16, 32, 4, 2
        block = EfficientInteractionAttention(D, H)
        x = jax.random.normal(jax.random.key(0), (B, 2, T, D))
        emb = jax.random.normal(jax.random.key(1), (B, 2, 4 * D))
        lengths = jnp.asarray([T, 9])
        mask = (jnp.arange(T) < lengths[:, None]).astype(jnp.float32)[:, None, :]
        variables = block.init(jax.random.key(2), x, emb, mask)
        p = dict(variables["params"])
        p["proj_out"] = dict(p["proj_out"])
        p["proj_out"]["out"] = dict(p["proj_out"]["out"])
        p["proj_out"]["out"]["kernel"] = 0.1 * jax.random.normal(
            jax.random.key(3), p["proj_out"]["out"]["kernel"].shape
        )
        want = block.apply({"params": p}, x, emb, mask)

        emb_out = jax.nn.silu(emb) @ p["proj_out"]["emb"]["kernel"] + p["proj_out"]["emb"]["bias"]
        scale, shift = jnp.split(emb_out, 2, axis=-1)
        bmask = jnp.broadcast_to(mask, x.shape[:-1])
        got = fused_attention_block(
            x, jnp.flip(x, 1), jnp.flip(bmask, 1), scale, shift, p,
            num_heads=4, interpret=True,
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


class TestFusedBlocksInDenoiser:
    def test_same_tree_and_same_output(self):
        """fused_blocks=True declares the identical parameter tree and (in
        f32/interpret) reproduces the plain denoiser bit-for-bit at the
        model level — checkpoints swap freely between the paths."""
        from hig_tpu.models.denoiser import InteractionDenoiser

        TINY = dict(input_feats=263, num_frames=32, latent_dim=32, ff_size=64,
                    num_layers=2, num_heads=4, text_latent_dim=16)
        plain = InteractionDenoiser(**TINY)
        fused = InteractionDenoiser(**TINY, fused_blocks=True)
        B, T = 2, 12
        x = jax.random.normal(jax.random.key(0), (B, 2, T, 263))
        t = jnp.asarray([3, 7])
        lengths = jnp.asarray([T, 8])
        xf_proj = jax.random.normal(jax.random.key(1), (B, 2, 128))
        xf_out = jax.random.normal(jax.random.key(2), (B, 2, 7, 16))

        params = plain.init(jax.random.key(3), x, t, lengths, xf_proj, xf_out)
        # randomize zero-init heads for a nontrivial comparison
        leaves, tree = jax.tree_util.tree_flatten(params)
        keys = jax.random.split(jax.random.key(4), len(leaves))
        params = jax.tree_util.tree_unflatten(
            tree, [0.05 * jax.random.normal(k, l.shape, l.dtype)
                   for k, l in zip(keys, leaves)]
        )
        fused_init = fused.init(jax.random.key(5), x, t, lengths, xf_proj, xf_out)
        assert jax.tree_util.tree_structure(fused_init) == jax.tree_util.tree_structure(params)

        want = plain.apply(params, x, t, lengths, xf_proj, xf_out)
        got = fused.apply(params, x, t, lengths, xf_proj, xf_out)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

    def test_training_falls_back_to_flax_path(self):
        """With deterministic=False the fused kernel (no VJP, no dropout) is
        bypassed: gradients work and match the plain denoiser's (ADVICE r2:
        --fused_blocks previously exploded at grad-trace time inside jit)."""
        from hig_tpu.models.denoiser import InteractionDenoiser

        TINY = dict(input_feats=263, num_frames=32, latent_dim=32, ff_size=64,
                    num_layers=2, num_heads=4, text_latent_dim=16)
        plain = InteractionDenoiser(**TINY)
        fused = InteractionDenoiser(**TINY, fused_blocks=True)
        B, T = 2, 12
        x = jax.random.normal(jax.random.key(0), (B, 2, T, 263))
        t = jnp.asarray([3, 7])
        lengths = jnp.asarray([T, 8])
        xf_proj = jax.random.normal(jax.random.key(1), (B, 2, 128))
        xf_out = jax.random.normal(jax.random.key(2), (B, 2, 7, 16))
        params = plain.init(jax.random.key(3), x, t, lengths, xf_proj, xf_out)

        def loss(model, p):
            out = model.apply(
                p, x, t, lengths, xf_proj, xf_out, False,
                rngs={"dropout": jax.random.key(9)},
            )
            return jnp.mean(out**2)

        g_plain = jax.grad(lambda p: loss(plain, p))(params)
        g_fused = jax.grad(lambda p: loss(fused, p))(params)
        for a, b in zip(jax.tree_util.tree_leaves(g_plain),
                        jax.tree_util.tree_leaves(g_fused)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
