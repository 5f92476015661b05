"""Attention blocks for the interaction denoiser.

TPU-first re-design of the reference blocks
(codes/models/interaction_transformer.py:100-332). Two families:

* *Efficient* (linear) attention — MotionDiffuse's O(T·d²) formulation:
  softmax over the feature axis for Q, over the time axis for K, then two
  einsums. This is the default production path; the einsums map straight
  onto the MXU with no masking-softmax fusion needed.
* *Quadratic* attention — standard QKᵀ softmax, kept for the reference's
  ``--no_eff`` mode. The reference's quirks are reproduced deliberately:
  self-attention adds the raw 0/1 mask to the logits
  (interaction_transformer.py:292) while interaction attention adds
  (1-mask)·-1e5 (:240).

All blocks treat every leading axis before (T, D) as batch, so the
(B, actors, T, D) layout flows through unchanged. Residual + time-gated
StylizationBlock is applied inside each block, as in the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from hig_tpu.models.embeddings import StylizationBlock, make_layer_norm


def _attend(query, key, value, num_heads, key_mask=None, use_pallas=False):
    if use_pallas:
        from hig_tpu.ops.pallas_attention import fused_efficient_attention

        return fused_efficient_attention(query, key, value, num_heads, key_mask)
    return efficient_attention(query, key, value, num_heads, key_mask)


class _DenseParams(nn.Module):
    """Parameters of an nn.Dense (same tree layout/init) without the matmul —
    the Pallas fused-attention kernel consumes the raw weights."""

    in_features: int
    features: int
    zero_init: bool = False

    @nn.compact
    def __call__(self):
        init = nn.initializers.zeros if self.zero_init else nn.initializers.lecun_normal()
        kernel = self.param("kernel", init, (self.in_features, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class _LayerNormParams(nn.Module):
    """nn.LayerNorm's parameter tree without the normalization."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return scale, bias


class _StylizationParams(nn.Module):
    """StylizationBlock's parameter tree (emb Dense, norm LN, zero-init out
    Dense) without the compute — consumed by the fused block kernel."""

    latent_dim: int
    emb_dim: int

    @nn.compact
    def __call__(self):
        emb_k, emb_b = _DenseParams(self.emb_dim, 2 * self.latent_dim, name="emb")()
        n_s, n_b = _LayerNormParams(self.latent_dim, name="norm")()
        o_k, o_b = _DenseParams(self.latent_dim, self.latent_dim, zero_init=True,
                                name="out")()
        return {"emb": {"kernel": emb_k, "bias": emb_b},
                "norm": {"scale": n_s, "bias": n_b},
                "out": {"kernel": o_k, "bias": o_b}}


def _fused_projected(q_src, kv_src, qkv_params, num_heads, key_mask=None):
    from hig_tpu.ops.pallas_attention import fused_projected_attention

    (wq, bq), (wk, bk), (wv, bv) = qkv_params
    return fused_projected_attention(
        q_src, kv_src, wq, bq, wk, bk, wv, bv, num_heads, key_mask=key_mask
    )


def _split_heads(x: jax.Array, num_heads: int) -> jax.Array:
    return x.reshape(x.shape[:-1] + (num_heads, x.shape[-1] // num_heads))


def _merged_qkv(xn, qkv_params, dtype):
    """One (D, 3D) matmul instead of three (D, D) ones.

    x @ concat(Wq, Wk, Wv) column-concatenated is BITWISE identical to the
    three separate products (each output column reduces over the same K
    elements), the input activations stream from HBM once instead of three
    times, and the concatenated weights are loop-invariant so XLA hoists
    the concat out of a sampling scan. Parameter tree (query/key/value
    kernel+bias) is unchanged — checkpoints are oblivious.
    """
    (wq, bq), (wk, bk), (wv, bv) = qkv_params
    w = jnp.concatenate([wq, wk, wv], axis=1).astype(dtype)
    b = jnp.concatenate([bq, bk, bv]).astype(dtype)
    qkv = xn @ w + b
    return jnp.split(qkv, 3, axis=-1)


# Layout experiment (ROOFLINE.md "layout copies" slice): when True, the
# K time-softmax's normalization is applied AFTER the T-contraction — the
# big (..., T, H, dh) tensor is only exp'd, and the divide-by-z lands on
# the small (..., H, dh, dh) state. Mathematically identical (z is
# independent of n); float rounding differs slightly. Toggled by the
# layout A/B harness, not a user flag.
LAZY_KNORM = False


def efficient_attention(
    query: jax.Array,
    key: jax.Array,
    value: jax.Array,
    num_heads: int,
    key_mask: jax.Array | None = None,
) -> jax.Array:
    """Shared core of the linear-attention family.

    query (..., T, D), key/value (..., N, D); key_mask (..., N) 0/1.
    softmax(Q over features) · [softmax(K over time)ᵀ V]
    (ref: interaction_transformer.py:119-128)
    """
    D = query.shape[-1]
    q = _split_heads(query, num_heads)
    if key_mask is not None:
        key = key + (1.0 - key_mask[..., None]) * -1000000.0
        value = value * key_mask[..., None]
    k = _split_heads(key, num_heads)
    v = _split_heads(value, num_heads)
    q = jax.nn.softmax(q, axis=-1)
    if LAZY_KNORM:
        m = jax.lax.stop_gradient(jnp.max(k, axis=-3, keepdims=True))
        e = jnp.exp(k - m)
        attention = jnp.einsum("...nhd,...nhl->...hdl", e, v)
        z = jnp.sum(e, axis=-3)  # (..., h, d)
        attention = attention / z[..., None]
    else:
        kn = jax.nn.softmax(k, axis=-3)  # over the time axis
        attention = jnp.einsum("...nhd,...nhl->...hdl", kn, v)
    y = jnp.einsum("...nhd,...hdl->...nhl", q, attention)
    return y.reshape(y.shape[:-2] + (D,))


def causal_efficient_attention(
    query: jax.Array,
    key: jax.Array,
    value: jax.Array,
    num_heads: int,
    key_mask: jax.Array | None = None,
) -> jax.Array:
    """Causal variant of the linear-attention family (--causal).

    The reference parses --causal but never consumes it anywhere
    (base_options.py:19 — grep-verified dead); this defines real semantics:
    position i's K-softmax normalizes over j ≤ i only, so
    y_i = softmax_feat(q_i) · Σ_{j≤i} exp(k_j) ⊗ v_j / Σ_{j≤i} exp(k_j),
    computed with cumulative sums (still O(T·d²) FLOPs; materializes the
    running (T, H, dh, dh) state, so intended for ablations, not the hot
    sampling path). A global max-subtraction stabilizes exp and cancels
    exactly in the ratio.
    """
    D = query.shape[-1]
    q = _split_heads(query, num_heads)
    if key_mask is not None:
        key = key + (1.0 - key_mask[..., None]) * -1000000.0
        value = value * key_mask[..., None]
    k = _split_heads(key, num_heads)
    v = _split_heads(value, num_heads)
    q = jax.nn.softmax(q, axis=-1)
    k = jnp.exp(k - jax.lax.stop_gradient(jnp.max(k, axis=-3, keepdims=True)))
    S = jnp.cumsum(jnp.einsum("...nhd,...nhl->...nhdl", k, v), axis=-4)
    z = jnp.cumsum(k, axis=-3)  # (..., n, h, d)
    A = S / jnp.maximum(z[..., None], 1e-30)
    y = jnp.einsum("...nhd,...nhdl->...nhl", q, A)
    return y.reshape(y.shape[:-2] + (D,))


def causal_bias(T: int, dtype=jnp.float32) -> jax.Array:
    """(T, T, 1) additive logit bias masking j > i (for quadratic --causal)."""
    i = jnp.arange(T)[:, None]
    j = jnp.arange(T)[None, :]
    return ((j > i) * -1000000.0).astype(dtype)[..., None]


def quadratic_attention(
    query: jax.Array,
    key: jax.Array,
    value: jax.Array,
    num_heads: int,
    logit_bias: jax.Array | None = None,
) -> jax.Array:
    """Standard softmax attention; ``logit_bias`` (..., T, N, 1) added raw.

    (ref: interaction_transformer.py:283-296)
    """
    D = query.shape[-1]
    q = _split_heads(query, num_heads)
    k = _split_heads(key, num_heads)
    v = _split_heads(value, num_heads)
    scale = 1.0 / jnp.sqrt(jnp.asarray(D // num_heads, q.dtype))
    logits = jnp.einsum("...nhd,...mhd->...nmh", q, k) * scale
    if logit_bias is not None:
        logits = logits + logit_bias
    weights = jax.nn.softmax(logits, axis=-2)
    y = jnp.einsum("...nmh,...mhd->...nhd", weights, v)
    return y.reshape(y.shape[:-2] + (D,))


def _fused_block_params(latent_dim: int, emb_dim: int):
    """Declare the standard block parameter tree (same names/shapes/inits as
    the flax path) and return it as raw arrays for the fused kernel."""
    ln_s, ln_b = _LayerNormParams(latent_dim, name="norm")()
    q = _DenseParams(latent_dim, latent_dim, name="query")()
    k = _DenseParams(latent_dim, latent_dim, name="key")()
    v = _DenseParams(latent_dim, latent_dim, name="value")()
    styl = _StylizationParams(latent_dim, emb_dim, name="proj_out")()
    return {
        "norm": {"scale": ln_s, "bias": ln_b},
        "query": {"kernel": q[0], "bias": q[1]},
        "key": {"kernel": k[0], "bias": k[1]},
        "value": {"kernel": v[0], "bias": v[1]},
        "proj_out": styl,
    }


def _fused_block_apply(x, kv, mask, emb, params, num_heads, dtype):
    """Compute the per-sequence AdaLN scale/shift, then run the fused kernel.

    Inference-only (no VJP) — the 1000-step sampler is the target.
    """
    from hig_tpu.ops.fused_block import fused_attention_block

    p = jax.tree_util.tree_map(lambda a: a.astype(dtype), params)
    emb_out = (
        jax.nn.silu(emb.astype(dtype)) @ p["proj_out"]["emb"]["kernel"]
        + p["proj_out"]["emb"]["bias"]
    )
    scale, shift = jnp.split(emb_out, 2, axis=-1)
    return fused_attention_block(x, kv, mask, scale, shift, p, num_heads=num_heads)


class EfficientSelfAttention(nn.Module):
    """(ref: LinearTemporalSelfAttention, interaction_transformer.py:100-130)

    ``fused=True`` routes the whole block (both LayerNorms, QKV, attention,
    AdaLN gate, residual) through the monolithic Pallas kernel
    (ops/fused_block.py). Measured on v5e: 3.2x the XLA block in isolation
    (1.9 vs 6.1 ms), but ~6% SLOWER inside the full 1000-step sampler
    (1001 vs 1063 f/s) — XLA's cross-block fusion over the whole scan body
    is worth more than the kernel's intra-block fusion, so this stays off
    by default. Inference-only (no VJP); parameter tree identical to the
    flax path, so checkpoints swap freely between the two.
    """

    latent_dim: int
    num_heads: int
    dropout: float = 0.0
    use_pallas: bool = False
    fused: bool = False
    causal: bool = False
    fast_ln: bool = False
    rms: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, emb, src_mask, deterministic: bool = True, adaln=None):
        # The fused kernel has no VJP and skips dropout, so it is
        # inference-only: fall back to the flax path when training rather
        # than failing at grad-trace time (or silently dropping dropout).
        if self.fused and not self.causal and deterministic:
            params = _fused_block_params(self.latent_dim, emb.shape[-1])
            mask = jnp.broadcast_to(src_mask, x.shape[:-1])
            return _fused_block_apply(
                x, x, mask, emb, params, self.num_heads, self.dtype
            )
        xn = make_layer_norm(self.dtype, self.fast_ln, name="norm",
                             rms=self.rms)(x)
        D = self.latent_dim
        qkv_params = (
            _DenseParams(D, D, name="query")(),
            _DenseParams(D, D, name="key")(),
            _DenseParams(D, D, name="value")(),
        )
        if self.use_pallas and not self.causal:
            y = _fused_projected(xn, xn, qkv_params, self.num_heads, key_mask=src_mask)
        else:
            q, k, v = _merged_qkv(xn, qkv_params, self.dtype)
            attend = causal_efficient_attention if self.causal else efficient_attention
            y = attend(q, k, v, self.num_heads, key_mask=src_mask)
        styl = StylizationBlock(self.latent_dim, self.dropout, self.dtype,
                                self.fast_ln, rms=self.rms, name="proj_out")
        if adaln is not None:
            # (scale, shift) precomputed outside a sampling scan
            # (adaln_scale_shift_grid) — skips the per-step emb projection.
            return x + styl.from_scale_shift(y, *adaln, deterministic)
        return x + styl(y, emb, deterministic)


class EfficientCrossAttention(nn.Module):
    """Text cross-attention. (ref: LinearTemporalCrossAttention, :132-165)

    Because linear attention factors as softmax(Q)·[softmax(K)ᵀV] and the
    text tokens are constant across every step of a sampling scan, the whole
    KᵀV product is loop-invariant. :meth:`kv` computes it once (per layer,
    a tiny (..., H, dh, dh) tensor); :meth:`from_kv` is the per-step body —
    one Q projection and one small einsum. This removes the text K/V
    projections, the text LayerNorm, and the KᵀV contraction from the hot
    1000-step loop (the reference recomputes them every step,
    gaussian_diffusion.py:747-769 → interaction_transformer.py:361).
    The prior Pallas fused path for this block is superseded by the hoist.
    """

    latent_dim: int
    text_latent_dim: int
    num_heads: int
    dropout: float = 0.0
    use_pallas: bool = False
    fast_ln: bool = False
    rms: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.norm = make_layer_norm(self.dtype, self.fast_ln, rms=self.rms)
        # text_norm stays LayerNorm even under --rms_norm: it runs once per
        # sampling call (hoisted with kv), never in the scan body.
        self.text_norm = nn.LayerNorm(dtype=self.dtype)  # runs once (hoisted)
        self.query = nn.Dense(self.latent_dim, dtype=self.dtype)
        self.key = nn.Dense(self.latent_dim, dtype=self.dtype)
        self.value = nn.Dense(self.latent_dim, dtype=self.dtype)
        self.proj_out = StylizationBlock(self.latent_dim, self.dropout, self.dtype,
                                         self.fast_ln, rms=self.rms)

    def kv(self, xf: jax.Array) -> jax.Array:
        """Loop-invariant text KᵀV product: (..., L, Dt) → (..., H, dh, dh)."""
        xfn = self.text_norm(xf)
        k = _split_heads(self.key(xfn), self.num_heads)
        v = _split_heads(self.value(xfn), self.num_heads)
        k = jax.nn.softmax(k, axis=-3)  # over the text-token axis
        return jnp.einsum("...nhd,...nhl->...hdl", k, v)

    def from_kv(self, x, kv, emb, deterministic: bool = True, adaln=None):
        q = _split_heads(self.query(self.norm(x)), self.num_heads)
        q = jax.nn.softmax(q, axis=-1)
        y = jnp.einsum("...nhd,...hdl->...nhl", q, kv)
        y = y.reshape(y.shape[:-2] + (self.latent_dim,))
        if adaln is not None:
            return x + self.proj_out.from_scale_shift(y, *adaln, deterministic)
        return x + self.proj_out(y, emb, deterministic)

    def __call__(self, x, xf, emb, deterministic: bool = True, adaln=None):
        return self.from_kv(x, self.kv(xf), emb, deterministic, adaln=adaln)


class EfficientInteractionAttention(nn.Module):
    """Cross-actor attention — the paper's novelty block.

    Each actor queries the *other* actor's timeline with one shared weight
    set. The reference realizes this by doubling the batch
    (interaction_transformer.py:167-207); here the actor axis is explicit:
    partner features are ``flip(x, actor_axis)`` and both directions compute
    in one batched einsum. Note the reference normalizes x1 and x2 with the
    *same* LayerNorm and omits a text_norm — reproduced.
    """

    latent_dim: int
    num_heads: int
    dropout: float = 0.0
    use_pallas: bool = False
    fused: bool = False
    causal: bool = False
    fast_ln: bool = False
    rms: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, emb, src_mask, deterministic: bool = True, adaln=None):
        # x: (B, 2, T, D); emb: (B, 2, E); src_mask: (B, 1, T) or (B, 2, T).
        # Inference-only kernel (no VJP, no dropout) — see
        # EfficientSelfAttention for the deterministic guard rationale.
        if self.fused and not self.causal and deterministic:
            # kv from the flipped actor; kernel normalizes kv with the same
            # LN, matching the reference's shared-norm quirk
            params = _fused_block_params(self.latent_dim, emb.shape[-1])
            mask = jnp.broadcast_to(src_mask, x.shape[:-1])
            return _fused_block_apply(
                x, jnp.flip(x, axis=1), jnp.flip(mask, axis=1), emb, params,
                self.num_heads, self.dtype,
            )
        # LayerNorm is per-token, so norm(flip(x)) == flip(norm(x)): normalize
        # once and flip.
        norm = make_layer_norm(self.dtype, self.fast_ln, name="norm",
                               rms=self.rms)
        xn = norm(x)
        mask = jnp.broadcast_to(src_mask, x.shape[:-1])
        pmask = jnp.flip(mask, axis=1)
        D = self.latent_dim
        qkv_params = (
            _DenseParams(D, D, name="query")(),
            _DenseParams(D, D, name="key")(),
            _DenseParams(D, D, name="value")(),
        )
        if self.use_pallas and not self.causal:
            pn = jnp.flip(xn, axis=1)
            y = _fused_projected(xn, pn, qkv_params, self.num_heads, key_mask=pmask)
        else:
            # Dense is per-token, so k(flip(x)) == flip(k(x)): project all of
            # q/k/v from xn in ONE merged matmul, then flip k/v on the
            # 2-element actor axis (a metadata-cheap rev) — the partner
            # stream never needs its own projection pass.
            q, k, v = _merged_qkv(xn, qkv_params, self.dtype)
            k = jnp.flip(k, axis=1)
            v = jnp.flip(v, axis=1)
            attend = causal_efficient_attention if self.causal else efficient_attention
            y = attend(q, k, v, self.num_heads, key_mask=pmask)
        styl = StylizationBlock(self.latent_dim, self.dropout, self.dtype,
                                self.fast_ln, rms=self.rms, name="proj_out")
        if adaln is not None:
            return x + styl.from_scale_shift(y, *adaln, deterministic)
        return x + styl(y, emb, deterministic)


class QuadraticSelfAttention(nn.Module):
    """(ref: TemporalSelfAttention, interaction_transformer.py:266-297).

    Deliberate deviation: the reference adds the raw 0/1 mask to the logits
    (:292), which neither masks anything nor even broadcasts for B≠T — the
    --no_eff self-attention path is effectively broken upstream. Here padded
    keys get the standard -1e6 bias so the quadratic path is actually usable.

    ``use_pallas`` routes through the tiled flash-attention kernel
    (ops/flash_attention.py) — same math (incl. the -1e6 bias), O(BQ·BK)
    logit residency instead of the full (N·H, T, T) tensor.
    """

    latent_dim: int
    num_heads: int
    dropout: float = 0.0
    causal: bool = False
    use_pallas: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, emb, src_mask, deterministic: bool = True, adaln=None):
        xn = nn.LayerNorm(dtype=self.dtype, name="norm")(x)
        q = nn.Dense(self.latent_dim, dtype=self.dtype, name="query")(xn)
        k = nn.Dense(self.latent_dim, dtype=self.dtype, name="key")(xn)
        v = nn.Dense(self.latent_dim, dtype=self.dtype, name="value")(xn)
        mask = jnp.broadcast_to(src_mask, x.shape[:-1])
        if self.use_pallas:
            from hig_tpu.ops.flash_attention import flash_attention

            y = flash_attention(
                q, k, v, self.num_heads, key_mask=mask, causal=self.causal
            )
        else:
            bias = (1.0 - mask)[..., None, :, None] * -1000000.0
            if self.causal:
                bias = bias + causal_bias(x.shape[-2], bias.dtype)
            y = quadratic_attention(q, k, v, self.num_heads, logit_bias=bias)
        styl = StylizationBlock(self.latent_dim, self.dropout, self.dtype, name="proj_out")
        if adaln is not None:
            return x + styl.from_scale_shift(y, *adaln, deterministic)
        return x + styl(y, emb, deterministic)


class QuadraticCrossAttention(nn.Module):
    """(ref: TemporalCrossAttention, interaction_transformer.py:299-332)

    Same loop-invariance as the linear block: projected text K/V are
    precomputable via :meth:`kv`; only the softmax depends on Q.
    """

    latent_dim: int
    text_latent_dim: int
    num_heads: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.norm = nn.LayerNorm(dtype=self.dtype)
        self.text_norm = nn.LayerNorm(dtype=self.dtype)
        self.query = nn.Dense(self.latent_dim, dtype=self.dtype)
        self.key = nn.Dense(self.latent_dim, dtype=self.dtype)
        self.value = nn.Dense(self.latent_dim, dtype=self.dtype)
        self.proj_out = StylizationBlock(self.latent_dim, self.dropout, self.dtype)

    def kv(self, xf: jax.Array) -> tuple[jax.Array, jax.Array]:
        xfn = self.text_norm(xf)
        return self.key(xfn), self.value(xfn)

    def from_kv(self, x, kv, emb, deterministic: bool = True, adaln=None):
        k, v = kv
        q = self.query(self.norm(x))
        y = quadratic_attention(q, k, v, self.num_heads)
        if adaln is not None:
            return x + self.proj_out.from_scale_shift(y, *adaln, deterministic)
        return x + self.proj_out(y, emb, deterministic)

    def __call__(self, x, xf, emb, deterministic: bool = True, adaln=None):
        return self.from_kv(x, self.kv(xf), emb, deterministic, adaln=adaln)


class QuadraticInteractionAttention(nn.Module):
    """(ref: TemporalInteractionCrossAttention, interaction_transformer.py:209-249)"""

    latent_dim: int
    num_heads: int
    dropout: float = 0.0
    causal: bool = False
    use_pallas: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, emb, src_mask, deterministic: bool = True, adaln=None):
        partner = jnp.flip(x, axis=1)
        norm = nn.LayerNorm(dtype=self.dtype, name="norm")
        text_norm = nn.LayerNorm(dtype=self.dtype, name="text_norm")
        q = nn.Dense(self.latent_dim, dtype=self.dtype, name="query")(norm(x))
        k = nn.Dense(self.latent_dim, dtype=self.dtype, name="key")(text_norm(partner))
        v = nn.Dense(self.latent_dim, dtype=self.dtype, name="value")(text_norm(partner))
        mask = jnp.broadcast_to(src_mask, x.shape[:-1])
        pmask = jnp.flip(mask, axis=1)
        if self.use_pallas:
            # NB: the kernel's padding bias is -1e6 vs the reference's -1e5
            # here (:240) — both saturate the softmax identically.
            from hig_tpu.ops.flash_attention import flash_attention

            y = flash_attention(
                q, k, v, self.num_heads, key_mask=pmask, causal=self.causal
            )
        else:
            bias = (1.0 - pmask)[..., None, :, None] * -100000.0
            if self.causal:  # attend only to the partner's past
                bias = bias + causal_bias(x.shape[-2], bias.dtype)
            y = quadratic_attention(q, k, v, self.num_heads, logit_bias=bias)
        styl = StylizationBlock(self.latent_dim, self.dropout, self.dtype, name="proj_out")
        if adaln is not None:
            return x + styl.from_scale_shift(y, *adaln, deterministic)
        return x + styl(y, emb, deterministic)


class FFN(nn.Module):
    """GELU MLP with zero-init second layer + stylization gate.

    (ref: interaction_transformer.py:251-264)
    """

    latent_dim: int
    ffn_dim: int
    dropout: float = 0.0
    fast_ln: bool = False
    rms: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, emb, deterministic: bool = True, adaln=None):
        h = nn.Dense(self.ffn_dim, dtype=self.dtype, name="linear1")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(
            self.latent_dim,
            kernel_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="linear2",
        )(h)
        styl = StylizationBlock(self.latent_dim, self.dropout, self.dtype,
                                self.fast_ln, rms=self.rms, name="proj_out")
        if adaln is not None:
            return x + styl.from_scale_shift(h, *adaln, deterministic)
        return x + styl(h, emb, deterministic)
