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
