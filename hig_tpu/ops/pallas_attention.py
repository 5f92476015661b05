"""Pallas TPU kernels for the attention hot path.

The denoiser's dominant op is MotionDiffuse "efficient attention"
(softmax over features for Q, masked softmax over time for K, then
(KᵀV) → Q·(KV); see hig_tpu/models/attention.py). XLA fuses the einsums
well, but the full block still materializes four (N, T, H, hd)
intermediates in HBM per call; this kernel keeps the whole per-(batch,
head) computation resident in VMEM — one HBM read per operand, one write
per output.

Differentiability: the kernel carries a custom VJP whose backward pass is
the einsum formulation's VJP, so the fused forward drops into training
too. Numerical parity with the einsum path is tested in interpret mode.

Measured on v5e (B=64 pairs, T=91, D=512, H=8): the kernel alone is 2.8×
faster than the einsum path (2.1 ms vs 5.8 ms per application), but inside
the full denoiser the (N·H, T, hd) relayout acts as a fusion barrier for
the surrounding QKV/output projections and the end-to-end sampler gets
slower — hence ``use_pallas`` defaults to False. The productive next step
(round 2) is folding the projections into the kernel so the barrier pays
for itself.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _einsum_reference(q, k, v, mask):
    """The einsum formulation (attention.py:efficient_attention) on
    (N, T, H, hd) tensors; mask (N, Tk) or None."""
    if mask is not None:
        k = k + (1.0 - mask)[:, :, None, None] * -1000000.0
        v = v * mask[:, :, None, None]
    q = jax.nn.softmax(q, axis=-1)
    k = jax.nn.softmax(k, axis=1)
    att = jnp.einsum("nkhd,nkhl->nhdl", k, v)
    return jnp.einsum("nqhd,nhdl->nqhl", q, att)


def _kernel(q_ref, k_ref, v_ref, mask_ref, o_ref):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    mask = mask_ref[0, 0]
    k = k + (1.0 - mask)[:, None] * -1000000.0
    v = v * mask[:, None]
    q = jax.nn.softmax(q, axis=-1)
    k = jax.nn.softmax(k, axis=0)
    att = jnp.dot(k.T, v, preferred_element_type=jnp.float32)
    y = jnp.dot(q, att.astype(q.dtype), preferred_element_type=jnp.float32)
    o_ref[0] = y.astype(o_ref.dtype)


def _pallas_impl(q, k, v, mask, interpret=False):
    """q/k/v: (N, Tq|Tk, H, hd); mask: (N, Tk). Internally runs per-(n, h)
    blocks on an (N·H, T, hd) layout (Mosaic needs the trailing block dims
    aligned or full)."""
    N, Tq, H, hd = q.shape
    Tk = k.shape[1]

    def to_nh(x, T):
        return x.transpose(0, 2, 1, 3).reshape(N * H, T, hd)

    qh, kh, vh = to_nh(q, Tq), to_nh(k, Tk), to_nh(v, Tk)
    mask3 = mask[:, None, :]  # (N, 1, Tk)
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((N * H, Tq, hd), q.dtype),
        grid=(N * H,),
        in_specs=[
            pl.BlockSpec((1, Tq, hd), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, Tk, hd), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, Tk, hd), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, Tk), lambda i: (i // H, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, Tq, hd), lambda i: (i, 0, 0)),
        interpret=interpret,
    )(qh, kh, vh, mask3)
    return out.reshape(N, H, Tq, hd).transpose(0, 2, 1, 3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _fused(q, k, v, mask, interpret):
    return _pallas_impl(q, k, v, mask, interpret)


def _fused_fwd(q, k, v, mask, interpret):
    return _pallas_impl(q, k, v, mask, interpret), (q, k, v, mask)


def _fused_bwd(interpret, residuals, g):
    q, k, v, mask = residuals
    _, vjp = jax.vjp(lambda q_, k_, v_: _einsum_reference(q_, k_, v_, mask), q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


_fused.defvjp(_fused_fwd, _fused_bwd)


# ---------------------------------------------------------------------------
# v2: projections fused into the kernel. The plain fused core (above) loses
# end-to-end because its relayout is a fusion barrier between the QKV
# projections and the attention math; this variant moves the projections
# inside, so the kernel reads only the (pre-normalized) activations and the
# weight matrices from HBM and writes only the attention output.
# ---------------------------------------------------------------------------


def _proj_kernel(qsrc_ref, kvsrc_ref, wq_ref, bq_ref, wk_ref, bk_ref,
                 wv_ref, bv_ref, mask_ref, o_ref, *, num_heads):
    xq = qsrc_ref[0]  # (Tq, Dq)
    xkv = kvsrc_ref[0]  # (Tk, Dk)
    q = jnp.dot(xq, wq_ref[...], preferred_element_type=jnp.float32) + bq_ref[0]
    k = jnp.dot(xkv, wk_ref[...], preferred_element_type=jnp.float32) + bk_ref[0]
    v = jnp.dot(xkv, wv_ref[...], preferred_element_type=jnp.float32) + bv_ref[0]
    mask = mask_ref[0, 0]
    k = k + (1.0 - mask)[:, None] * -1000000.0
    v = v * mask[:, None]
    Tq, D = q.shape
    hd = D // num_heads
    # static per-head loop with 2D ops (Mosaic lowers 2D dots; 3D einsums
    # failed the remote compiler)
    for h in range(num_heads):
        sl = slice(h * hd, (h + 1) * hd)
        qh = jax.nn.softmax(q[:, sl], axis=-1)
        kh = jax.nn.softmax(k[:, sl], axis=0)
        vh = v[:, sl]
        att = jnp.dot(kh.T, vh, preferred_element_type=jnp.float32)
        yh = jnp.dot(qh, att, preferred_element_type=jnp.float32)
        o_ref[0, :, sl] = yh.astype(o_ref.dtype)


def _proj_impl(q_src, kv_src, wq, bq, wk, bk, wv, bv, mask, num_heads, interpret):
    N, Tq, Dq = q_src.shape
    Tk = kv_src.shape[1]
    Dk = kv_src.shape[2]
    D = wq.shape[1]
    kernel = functools.partial(_proj_kernel, num_heads=num_heads)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((N, Tq, D), q_src.dtype),
        grid=(N,),
        in_specs=[
            pl.BlockSpec((1, Tq, Dq), lambda n: (n, 0, 0)),
            pl.BlockSpec((1, Tk, Dk), lambda n: (n, 0, 0)),
            pl.BlockSpec((Dq, D), lambda n: (0, 0)),
            pl.BlockSpec((1, D), lambda n: (0, 0)),
            pl.BlockSpec((Dk, D), lambda n: (0, 0)),
            pl.BlockSpec((1, D), lambda n: (0, 0)),
            pl.BlockSpec((Dk, D), lambda n: (0, 0)),
            pl.BlockSpec((1, D), lambda n: (0, 0)),
            pl.BlockSpec((1, 1, Tk), lambda n: (n, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, Tq, D), lambda n: (n, 0, 0)),
        interpret=interpret,
    )(q_src, kv_src, wq, bq[None], wk, bk[None], wv, bv[None], mask[:, None, :])


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10))
def _proj_fused(q_src, kv_src, wq, bq, wk, bk, wv, bv, mask, num_heads, interpret):
    return _proj_impl(q_src, kv_src, wq, bq, wk, bk, wv, bv, mask, num_heads, interpret)


def _proj_fused_fwd(q_src, kv_src, wq, bq, wk, bk, wv, bv, mask, num_heads, interpret):
    out = _proj_impl(q_src, kv_src, wq, bq, wk, bk, wv, bv, mask, num_heads, interpret)
    return out, (q_src, kv_src, wq, bq, wk, bk, wv, bv, mask)


def _proj_fused_bwd(num_heads, interpret, residuals, g):
    q_src, kv_src, wq, bq, wk, bk, wv, bv, mask = residuals

    def ref(q_src, kv_src, wq, bq, wk, bk, wv, bv):
        q = q_src @ wq + bq
        k = kv_src @ wk + bk
        v = kv_src @ wv + bv
        N, Tq, D = q.shape
        Tk = k.shape[1]
        hd = D // num_heads
        out = _einsum_reference(
            q.reshape(N, Tq, num_heads, hd),
            k.reshape(N, Tk, num_heads, hd),
            v.reshape(N, Tk, num_heads, hd),
            mask,
        )
        return out.reshape(N, Tq, D)

    _, vjp = jax.vjp(ref, q_src, kv_src, wq, bq, wk, bk, wv, bv)
    grads = vjp(g)
    return grads + (None,)


_proj_fused.defvjp(_proj_fused_fwd, _proj_fused_bwd)


def fused_projected_attention(
    q_src: jax.Array,
    kv_src: jax.Array,
    wq: jax.Array,
    bq: jax.Array,
    wk: jax.Array,
    bk: jax.Array,
    wv: jax.Array,
    bv: jax.Array,
    num_heads: int,
    key_mask: jax.Array | None = None,
    interpret: bool | None = None,
) -> jax.Array:
    """Efficient attention with QKV projections fused into the kernel.

    q_src (..., Tq, Dq), kv_src (..., Tk, Dk); weights are flax Dense layout
    (in, out). Returns (..., Tq, D).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    lead = q_src.shape[:-2]
    Tq, Dq = q_src.shape[-2:]
    Tk, Dk = kv_src.shape[-2:]
    N = 1
    for s in lead:
        N *= s
    q2 = q_src.reshape(N, Tq, Dq)
    kv2 = kv_src.reshape(N, Tk, Dk)
    if key_mask is None:
        mask = jnp.ones((N, Tk), q_src.dtype)
    else:
        mask = jnp.broadcast_to(key_mask, lead + (Tk,)).reshape(N, Tk).astype(q_src.dtype)
    out = _proj_fused(q2, kv2, wq, bq, wk, bk, wv, bv, mask, num_heads, interpret)
    return out.reshape(lead + (Tq, wq.shape[1]))


def fused_efficient_attention(
    query: jax.Array,
    key: jax.Array,
    value: jax.Array,
    num_heads: int,
    key_mask: jax.Array | None = None,
    interpret: bool | None = None,
) -> jax.Array:
    """Drop-in fused replacement for attention.efficient_attention.

    query (..., Tq, D); key/value (..., Tk, D); key_mask (..., Tk).
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
    q = query.reshape(N, Tq, num_heads, hd)
    k = key.reshape(N, Tk, num_heads, hd)
    v = value.reshape(N, Tk, num_heads, hd)
    if key_mask is None:
        mask = jnp.ones((N, Tk), q.dtype)
    else:
        mask = jnp.broadcast_to(key_mask, lead + (Tk,)).reshape(N, Tk).astype(q.dtype)
    out = _fused(q, k, v, mask, interpret)
    return out.reshape(lead + (Tq, D))
