"""Tiled flash attention (Pallas TPU) for the quadratic attention path.

The reference's ``--no_eff`` mode is standard QKᵀ-softmax attention
(codes/models/interaction_transformer.py:209-332). XLA materializes the
(N·H, Tq, Tk) logits in HBM; this kernel computes attention with the
online-softmax recurrence (Dao et al., FlashAttention) so only
O(BQ·BK) logits are ever resident, tiled to the MXU:

  grid = (N·H, Tq/BQ); each program owns one query block and streams the
  key/value blocks, carrying the running max m, normalizer l, and output
  accumulator through a ``fori_loop``.

Supports key-padding masks (additive −1e6, matching
attention.quadratic_attention so interpret-mode parity is exact) and a
causal option (--causal). Differentiable via custom VJP: the backward pass
is the einsum formulation's VJP — the forward saves only (q, k, v, mask),
which is the flash-attention memory win during training.

Measured regime (v5e, standalone op, B=8 D=512 H=8 bf16 — NOTES.md):
the kernel beats the XLA einsum path by 1.37-1.42x at T=512-1024; at the
reference's shapes (T ≤ 196, hd=64) XLA wins (per-head relayout is a
fusion barrier), and at T ≥ 2048 the whole-K/V-in-VMEM layout spills
(a DMA-streamed K/V loop is the extension for that regime). Hence
``use_pallas`` defaults off for the reference model; the kernel is the
long-context path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

NEG_BIAS = -1000000.0  # matches attention.py's masking bias exactly


def _reference(q, k, v, mask, causal, scale):
    """Einsum quadratic attention on (N, T, hd) per-head tensors."""
    s = jnp.einsum("nqd,nkd->nqk", q, k) * scale
    if mask is not None:
        s = s + (1.0 - mask)[:, None, :] * NEG_BIAS
    if causal:
        Tq, Tk = s.shape[-2:]
        i = jnp.arange(Tq)[:, None]
        j = jnp.arange(Tk)[None, :]
        s = s + (j > i) * NEG_BIAS
    w = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("nqk,nkd->nqd", w, v)


def _flash_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale, causal,
                  bq, bk):
    qi = pl.program_id(1)
    q = q_ref[0].astype(jnp.float32) * scale  # (BQ, hd)
    hd = q.shape[-1]
    Tk = k_ref.shape[1]
    nkb = Tk // bk

    m0 = jnp.full((bq, 1), -1e30, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc0 = jnp.zeros((bq, hd), jnp.float32)

    def body(kb, carry):
        m, l, acc = carry
        k = k_ref[0, pl.ds(kb * bk, bk), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(kb * bk, bk), :]
        mask = mask_ref[0, 0, pl.ds(kb * bk, bk)].astype(jnp.float32)
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)  # (BQ, BK)
        s = s + (1.0 - mask)[None, :] * NEG_BIAS
        if causal:
            iq = qi * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
            ik = kb * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
            s = s + jnp.where(ik > iq, NEG_BIAS, 0.0)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        )
        return m_new, l, acc

    m, l, acc = jax.lax.fori_loop(0, nkb, body, (m0, l0, acc0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _pad_to(x, axis, mult):
    size = x.shape[axis]
    pad = (-size) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _flash_impl(q, k, v, mask, scale, causal, interpret, bq=128, bk=128):
    """q/k/v: (NH, Tq|Tk, hd) per-head layout; mask (N, Tk)."""
    NH, Tq, hd = q.shape
    Tk = k.shape[1]
    N = mask.shape[0]
    heads = NH // N
    bq = min(bq, max(8, ((Tq + 7) // 8) * 8))
    bk = min(bk, max(8, ((Tk + 7) // 8) * 8))
    qp = _pad_to(q, 1, bq)
    kp = _pad_to(k, 1, bk)
    vp = _pad_to(v, 1, bk)
    maskp = _pad_to(mask, 1, bk)[:, None, :]  # padded keys masked out
    Tqp, Tkp = qp.shape[1], kp.shape[1]

    kernel = functools.partial(
        _flash_kernel, scale=scale, causal=causal, bq=bq, bk=bk
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((NH, Tqp, hd), q.dtype),
        grid=(NH, Tqp // bq),
        in_specs=[
            pl.BlockSpec((1, bq, hd), lambda i, qi: (i, qi, 0)),
            pl.BlockSpec((1, Tkp, hd), lambda i, qi: (i, 0, 0)),
            pl.BlockSpec((1, Tkp, hd), lambda i, qi: (i, 0, 0)),
            pl.BlockSpec((1, 1, Tkp), lambda i, qi: (i // heads, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, hd), lambda i, qi: (i, qi, 0)),
        interpret=interpret,
    )(qp, kp, vp, maskp)
    return out[:, :Tq]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _flash(q, k, v, mask, scale, causal, interpret):
    return _flash_impl(q, k, v, mask, scale, causal, interpret)


def _flash_fwd(q, k, v, mask, scale, causal, interpret):
    return _flash_impl(q, k, v, mask, scale, causal, interpret), (q, k, v, mask)


def _flash_bwd(scale, causal, interpret, residuals, g):
    q, k, v, mask = residuals
    N = mask.shape[0]
    heads = q.shape[0] // N
    maskh = jnp.repeat(mask, heads, axis=0)
    _, vjp = jax.vjp(
        lambda q_, k_, v_: _reference(q_, k_, v_, maskh, causal, scale), q, k, v
    )
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    query: jax.Array,
    key: jax.Array,
    value: jax.Array,
    num_heads: int,
    key_mask: jax.Array | None = None,
    causal: bool = False,
    interpret: bool | None = None,
) -> jax.Array:
    """Drop-in fused quadratic attention.

    query (..., Tq, D); key/value (..., Tk, D); key_mask (..., Tk) 0/1.
    Scale is 1/sqrt(D/num_heads), matching attention.quadratic_attention.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    D = query.shape[-1]
    hd = D // num_heads
    lead = query.shape[:-2]
    Tq, Tk = query.shape[-2], key.shape[-2]
    N = 1
    for s in lead:
        N *= s

    def to_nh(x, T):
        return x.reshape(N, T, num_heads, hd).transpose(0, 2, 1, 3).reshape(
            N * num_heads, T, hd
        )

    q = to_nh(query, Tq)
    k = to_nh(key, Tk)
    v = to_nh(value, Tk)
    if key_mask is None:
        mask = jnp.ones((N, Tk), query.dtype)
    else:
        mask = jnp.broadcast_to(key_mask, lead + (Tk,)).reshape(N, Tk).astype(query.dtype)
    scale = 1.0 / float(hd) ** 0.5
    out = _flash(q, k, v, mask, scale, causal, interpret)
    return (
        out.reshape(N, num_heads, Tq, hd).transpose(0, 2, 1, 3).reshape(lead + (Tq, D))
    )
