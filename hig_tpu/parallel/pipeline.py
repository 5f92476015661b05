"""GPipe-style pipeline parallelism for the denoiser layer stack.

The reference has no pipeline parallelism at all (SURVEY.md §2.6: "PP:
absent") — at reference scale (8 layers, d=512) none is needed, so like
TP this is capacity headroom for larger variants, implemented TPU-natively:

* The homogeneous ``layer_0 … layer_{L-1}`` parameter subtrees are stacked
  on a leading layer axis and **sharded over the mesh's model axis** —
  each of S stages holds L/S contiguous layers in its own HBM.
* The batch is split into M microbatches that stream through the stages
  under ``shard_map``: each tick every stage runs its local layers
  (``lax.scan``) on the microbatch it currently holds and hands the
  activations to the next stage with a single ``lax.ppermute`` hop over
  ICI (the classic fill/steady/drain schedule, M + S - 1 ticks).
* The microbatch batch dim stays sharded over the mesh's **data** axis, so
  DP×PP composes in one program.

The schedule is exact — every layer sees the same inputs in the same
order as the sequential stack, so outputs match the plain denoiser
bitwise up to XLA fusion differences (pinned by tests/test_parallel_pp.py).
Inference/serving path (dropout off); the efficient-attention stack with
hoisted per-layer text-KV is required.

Bubble cost (honest accounting): during the S-1 fill and S-1 drain ticks,
stages that hold no valid microbatch still execute their layers on a
clamped (stale) microbatch and discard the result — under SPMD every
device must run the same program, so the classic GPipe bubble shows up
here as wasted compute rather than idle time. Relative overhead is the
standard (S-1)/(M+S-1); e.g. 2 stages x 2 microbatches wastes 1/3 of
stage-compute, 2 x 8 wastes 1/9. Masking those ticks with lax.cond would
not help: both branches of a cond are compiled and the schedule is
data-independent, so the honest lever is more microbatches per step.
Unmeasured on real multi-chip hardware (1-chip environment).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from hig_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def stack_layer_params(denoiser_params: dict, num_layers: int):
    """layer_0..layer_{L-1} subtrees → one pytree with a leading L axis."""
    layers = [denoiser_params[f"layer_{i}"] for i in range(num_layers)]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)


def _dyn(a, i):
    return jax.lax.dynamic_index_in_dim(a, i, 0, keepdims=False)


def pipeline_layers(
    layer_mod,
    stacked_params,
    stacked_kv: jax.Array,
    h: jax.Array,
    emb: jax.Array,
    src_mask: jax.Array,
    mesh,
    n_micro: int,
):
    """Run the L-layer stack over S pipeline stages on ``mesh``'s model axis.

    layer_mod      an InteractionDenoiserLayer matching the model config
    stacked_params pytree with leading axis L (stage-sharded here)
    stacked_kv     (L, B, ...) per-layer hoisted text-KV state
    h              (B, 2, T, D) embedded hidden states
    emb            (B, 2, E) conditioning, src_mask (B, 1, T)
    """
    S = mesh.shape[MODEL_AXIS]
    L = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    B = h.shape[0]
    if L % S:
        raise ValueError(f"{L} layers not divisible into {S} stages")
    if B % n_micro:
        raise ValueError(f"batch {B} not divisible into {n_micro} microbatches")
    M, mB = n_micro, B // n_micro
    d = mesh.shape[DATA_AXIS]
    if mB % d:
        raise ValueError(
            f"microbatch size {mB} (batch {B} / {M} microbatches) must be "
            f"divisible by the data axis ({d}) — PP composes with DP by "
            "keeping each microbatch data-sharded"
        )

    h_m = h.reshape((M, mB) + h.shape[1:])
    emb_m = emb.reshape((M, mB) + emb.shape[1:])
    mask_m = src_mask.reshape((M, mB) + src_mask.shape[1:])
    kv_m = stacked_kv.reshape((L, M, mB) + stacked_kv.shape[2:])

    def stage_fn(params_s, kv_s, h_m, emb_m, mask_m):
        # params_s/kv_s: this stage's L/S layers; h_m/emb_m/mask_m: this
        # data-shard's microbatches (replicated over the model axis)
        s = jax.lax.axis_index(MODEL_AXIS)

        def run_layers(x_in, midx):
            def layer_step(hh, xs):
                p, kv_l = xs
                hh = layer_mod.apply(
                    {"params": p}, hh, None, _dyn(emb_m, midx),
                    _dyn(mask_m, midx), True, text_kv=_dyn(kv_l, midx),
                )
                return hh, None
            y, _ = jax.lax.scan(layer_step, x_in, (params_s, kv_s))
            return y

        def tick(carry, t):
            buf, out = carry
            # stage s processes microbatch m = t - s this tick
            midx = jnp.clip(t - s, 0, M - 1)
            x_in = jnp.where(s == 0, _dyn(h_m, jnp.clip(t, 0, M - 1)), buf)
            y = run_layers(x_in, midx)
            buf_next = jax.lax.ppermute(
                y, MODEL_AXIS, [(i, (i + 1) % S) for i in range(S)]
            )
            mo = t - (S - 1)
            valid = (s == S - 1) & (mo >= 0) & (mo < M)
            slot = jnp.clip(mo, 0, M - 1)
            cur = _dyn(out, slot)
            out = jax.lax.dynamic_update_index_in_dim(
                out, jnp.where(valid, y, cur), slot, 0
            )
            return (buf_next, out), None

        buf0 = jnp.zeros_like(_dyn(h_m, 0))
        out0 = jnp.zeros_like(h_m)
        (_, out), _ = jax.lax.scan(tick, (buf0, out0), jnp.arange(M + S - 1))
        # results live on the last stage; replicate over the model axis
        out = jnp.where(s == S - 1, out, jnp.zeros_like(out))
        return jax.lax.psum(out, MODEL_AXIS)

    stage_spec = jax.tree_util.tree_map(lambda _: P(MODEL_AXIS), stacked_params)
    micro_spec = P(None, DATA_AXIS)
    out = jax.shard_map(
        stage_fn,
        mesh=mesh,
        in_specs=(stage_spec, P(MODEL_AXIS, None, DATA_AXIS), micro_spec,
                  micro_spec, micro_spec),
        out_specs=micro_spec,
        check_vma=False,
    )(stacked_params, kv_m, h_m, emb_m, mask_m)
    return out.reshape((B,) + out.shape[2:])


def pipeline_denoise(
    model,
    params,
    x: jax.Array,
    timesteps: jax.Array,
    lengths: jax.Array,
    xf_proj: jax.Array,
    xf_out: jax.Array,
    mesh,
    n_micro: int = 2,
) -> jax.Array:
    """One denoiser call with the layer stack pipelined over the model axis.

    Drop-in for ``model.denoise`` on the efficient interaction stack
    (inference; dropout off). The embedding/conditioning/output heads are
    tiny and run replicated; only the L-layer transformer stack is staged.
    """
    from hig_tpu.models.denoiser import InteractionDenoiserLayer

    if model.single_transformer or not model.efficient:
        raise ValueError(
            "pipeline_denoise supports the efficient interaction stack"
        )
    layer_mod = InteractionDenoiserLayer(
        latent_dim=model.latent_dim,
        text_latent_dim=model.text_latent_dim,
        ff_size=model.ff_size,
        num_heads=model.num_heads,
        dropout=model.dropout,
        efficient=True,
        interaction=model.interaction,
        use_pallas=model.use_pallas,
        fused_blocks=model.fused_blocks,
        causal=model.causal,
        fast_ln=model.fast_ln,
        rms_norm=model.rms_norm,
        dtype=model.dtype,
    )
    den = params["params"]["denoiser"]
    stacked = stack_layer_params(den, model.num_layers)
    h, src_mask = model.apply(
        params, x, lengths, method=lambda m, xx, ll: m.denoiser.embed_inputs(xx, ll)
    )
    emb = model.apply(
        params, timesteps, xf_proj,
        method=lambda m, tt, pp: m.denoiser.conditioning(tt, pp),
    )
    kv = jnp.stack(model.apply(params, xf_out, method=type(model).text_kv))
    h_out = pipeline_layers(layer_mod, stacked, kv, h, emb, src_mask, mesh, n_micro)
    return model.apply(
        params, h_out, method=lambda m, hh: m.denoiser.project_out(hh)
    )
