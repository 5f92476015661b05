"""Monolithic fused linear-attention block kernel (Pallas TPU).

One kernel application = one full EfficientSelfAttention /
EfficientInteractionAttention block (models/attention.py):

    xn = LayerNorm_attn(x)
    q, k, v = xn·Wq+bq, kvn·Wk+bk, kvn·Wv+bv        (kvn = partner or self)
    k += (1-mask)·(-1e6);  v *= mask
    per head: y_h = softmax_feat(q_h) · [softmax_time(k_h)ᵀ v_h]
    z = LayerNorm_styl(y)·(1+scale) + shift          (AdaLN gate)
    out = x + SiLU(z)·Wo + bo

The round-1 kernels fused only the attention math (parity with XLA) or the
QKV projections (still parity). This one eliminates every HBM round-trip
inside the block: per grid row, x/partner are read once, the two LayerNorms
and the softmaxes run on VMEM-resident data between the four MXU matmuls,
and only the residual output is written. The per-sequence AdaLN projection
(emb → scale/shift) stays outside — it is O(B·E·D), not O(B·T·D).

Forward-only by design: the sampler is the hot path (1000 calls per
generation); training keeps the einsum formulation (this kernel carries no
VJP and `fused_self_attention_block` is wired into the denoiser only for
deterministic=True inference via ``use_pallas="block"``).

Numerical parity with the flax block is tested in interpret mode
(tests/test_pallas_ops.py::TestFusedBlock) and at the full-denoiser level.

Measured on v5e (B=64 pairs, T=91, D=512, H=8, bf16): 3.2x the XLA block
standalone (1.9 vs 6.1 ms — the standalone XLA block pays unfused
entry/exit HBM traffic), but ~6% slower inside the full sampler
(1001 vs 1063 f/s): in the real scan body XLA fuses across neighboring
blocks, which is worth more than this kernel's intra-block fusion. Kept as
an off-by-default option (--fused_blocks) and as the template for shapes
where XLA's fusion gives up. Getting bf16 matmuls through the remote
Mosaic compiler requires 16-sublane-aligned operands (hence the T padding);
unaligned bf16 dots crash it with an undiagnosed HTTP 500.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _block_kernel(
    x_ref, kv_ref, mask_ref, scale_ref, shift_ref,
    ln_a_s_ref, ln_a_b_ref, ln_s_s_ref, ln_s_b_ref,
    wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref, wo_ref, bo_ref,
    o_ref, y_scratch, *, num_heads,
):
    f32 = jnp.float32
    dt = x_ref.dtype
    x = x_ref[0].astype(f32)  # (T, D) — T padded to a multiple of 16 by the
    # wrapper: bf16 matmul operands need 16-sublane alignment or the remote
    # Mosaic compiler dies with an opaque HTTP 500
    xkv = kv_ref[0].astype(f32)
    mask = mask_ref[0, 0].astype(f32)  # (Tk,)

    def layer_norm(h, s, b):
        h = h.astype(f32)
        mu = jnp.mean(h, axis=-1, keepdims=True)
        var = jnp.mean((h - mu) ** 2, axis=-1, keepdims=True)
        return (h - mu) * jax.lax.rsqrt(var + 1e-6) * s + b

    xn = layer_norm(x, ln_a_s_ref[0].astype(f32), ln_a_b_ref[0].astype(f32))
    kvn = layer_norm(xkv, ln_a_s_ref[0].astype(f32), ln_a_b_ref[0].astype(f32))
    q = jnp.dot(xn.astype(dt), wq_ref[...], preferred_element_type=f32) + bq_ref[0].astype(f32)
    k = jnp.dot(kvn.astype(dt), wk_ref[...], preferred_element_type=f32) + bk_ref[0].astype(f32)
    v = jnp.dot(kvn.astype(dt), wv_ref[...], preferred_element_type=f32) + bv_ref[0].astype(f32)
    k = k + (1.0 - mask)[:, None] * -1000000.0
    v = v * mask[:, None]

    T, D = q.shape
    hd = D // num_heads
    # per-head results land in a VMEM scratch via static slice stores (the
    # same pattern as pallas_attention._proj_kernel; .at[].set lowers to
    # scatter and jnp.concatenate crashed the remote Mosaic compiler)
    for h in range(num_heads):  # static per-head loop; 2D ops lower cleanly
        sl = slice(h * hd, (h + 1) * hd)
        qh = jax.nn.softmax(q[:, sl], axis=-1)
        kh = jax.nn.softmax(k[:, sl], axis=0)
        att = jnp.dot(kh.T.astype(dt), v[:, sl].astype(dt),
                      preferred_element_type=f32)
        y_scratch[:, sl] = jnp.dot(qh.astype(dt), att.astype(dt),
                                   preferred_element_type=f32)
    y = y_scratch[...]

    z = layer_norm(y, ln_s_s_ref[0].astype(f32), ln_s_b_ref[0].astype(f32))
    z = z * (1.0 + scale_ref[0, 0].astype(f32)) + shift_ref[0, 0].astype(f32)
    z = z * jax.nn.sigmoid(z)  # SiLU
    out = jnp.dot(z.astype(dt), wo_ref[...], preferred_element_type=f32)
    out = out + bo_ref[0].astype(f32)
    o_ref[0] = (x + out).astype(o_ref.dtype)


def fused_attention_block(
    x: jax.Array,          # (..., T, D)
    kv_src: jax.Array,     # (..., Tk, D) — x itself (self) or partner (interaction)
    key_mask: jax.Array,   # (..., Tk)
    scale: jax.Array,      # (..., D) AdaLN scale (from the emb projection)
    shift: jax.Array,      # (..., D)
    params: dict,          # flax param subtrees (see wire-up below)
    num_heads: int,
    interpret: bool | None = None,
) -> jax.Array:
    """Apply one fused block. ``params`` carries the flax leaves:
    norm/{scale,bias}, query|key|value/{kernel,bias},
    proj_out/norm/{scale,bias}, proj_out/out/{kernel,bias}."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    lead = x.shape[:-2]
    T, D = x.shape[-2:]
    Tk = kv_src.shape[-2]
    N = 1
    for s in lead:
        N *= s
    Tp = ((T + 15) // 16) * 16
    Tkp = ((Tk + 15) // 16) * 16
    x2 = x.reshape(N, T, D)
    kv2 = kv_src.reshape(N, Tk, D)
    mask2 = jnp.broadcast_to(key_mask, lead + (Tk,)).reshape(N, 1, Tk).astype(x.dtype)
    if Tp != T:
        x2 = jnp.pad(x2, ((0, 0), (0, Tp - T), (0, 0)))
    if Tkp != Tk:
        kv2 = jnp.pad(kv2, ((0, 0), (0, Tkp - Tk), (0, 0)))
        mask2 = jnp.pad(mask2, ((0, 0), (0, 0), (0, Tkp - Tk)))  # pads masked out
    # (N, 1, D): Mosaic requires the last two block dims divisible by (8, 128)
    # or equal to the array dims — a singleton middle axis satisfies that for
    # per-sequence vectors.
    scale2 = jnp.broadcast_to(scale, lead + (D,)).reshape(N, 1, D).astype(x.dtype)
    shift2 = jnp.broadcast_to(shift, lead + (D,)).reshape(N, 1, D).astype(x.dtype)

    p = params
    row = lambda a: jnp.asarray(a)[None].astype(x.dtype)  # (1, D) operands
    kernel = functools.partial(_block_kernel, num_heads=num_heads)
    seq_spec = lambda T_: pl.BlockSpec((1, T_, D), lambda n: (n, 0, 0))
    vec_spec = pl.BlockSpec((1, D), lambda n: (0, 0))
    mat_spec = pl.BlockSpec((D, D), lambda n: (0, 0))
    from jax.experimental.pallas import tpu as pltpu

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((N, Tp, D), x.dtype),
        grid=(N,),
        scratch_shapes=[pltpu.VMEM((Tp, D), jnp.float32)],
        in_specs=[
            seq_spec(Tp),
            seq_spec(Tkp),
            pl.BlockSpec((1, 1, Tkp), lambda n: (n, 0, 0)),
            pl.BlockSpec((1, 1, D), lambda n: (n, 0, 0)),
            pl.BlockSpec((1, 1, D), lambda n: (n, 0, 0)),
            vec_spec, vec_spec, vec_spec, vec_spec,
            mat_spec, vec_spec, mat_spec, vec_spec, mat_spec, vec_spec,
            mat_spec, vec_spec,
        ],
        out_specs=seq_spec(Tp),
        interpret=interpret,
    )(
        x2, kv2, mask2, scale2, shift2,
        row(p["norm"]["scale"]), row(p["norm"]["bias"]),
        row(p["proj_out"]["norm"]["scale"]), row(p["proj_out"]["norm"]["bias"]),
        jnp.asarray(p["query"]["kernel"], x.dtype), row(p["query"]["bias"]),
        jnp.asarray(p["key"]["kernel"], x.dtype), row(p["key"]["bias"]),
        jnp.asarray(p["value"]["kernel"], x.dtype), row(p["value"]["bias"]),
        jnp.asarray(p["proj_out"]["out"]["kernel"], x.dtype),
        row(p["proj_out"]["out"]["bias"]),
    )
    return out[:, :T].reshape(lead + (T, D))
