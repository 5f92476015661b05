"""Device mesh + sharding rules.

The reference's entire distributed layer is single-host DDP over gloo with
an implicit gradient all-reduce (SURVEY.md §2.6). Here it is a
``jax.sharding.Mesh`` with a ``data`` axis (batch sharding; XLA fuses the
gradient all-reduce into the backward pass over ICI) and a ``model`` axis
used for FSDP-style parameter/optimizer-state sharding when enabled. At
reference scale (≈35M trainable params) DP alone is sufficient; the model
axis matters for memory headroom at larger latent dims or per-chip batch.

Multi-process semantics: every jit'd computation is global SPMD. Host data
enters through :func:`shard_batch`, which uses
``jax.make_array_from_process_local_data`` when more than one process is
present — each process feeds only its own contiguous slice of the global
batch (see ``data.dataset.epoch_batches``'s process sharding), replacing the
reference's per-rank ``DistributedSampler`` (codes/datasets/dataloader.py:16).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hig_tpu.config import MeshConfig

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(cfg: MeshConfig | None = None, devices=None) -> Mesh:
    """Global (data, model) mesh. In multi-process runs ``jax.devices()`` is
    the global device list, ordered process-major — so the data axis is
    contiguous per process and each process's addressable batch rows form one
    block (the layout ``shard_batch`` relies on).

    With ``cfg.dcn_data > 1`` the device order is built DCN-aware
    (mesh_utils.create_hybrid_device_mesh): the data axis is laid out
    slice-major (TPU pods: ``device.slice_index``; multi-host CPU/GPU:
    process granules), so the partitioner's gradient all-reduce becomes
    intra-slice ICI reductions + one small inter-slice DCN exchange. Axis
    names and all downstream sharding rules are unchanged."""
    devices = devices if devices is not None else jax.devices()
    cfg = cfg or MeshConfig()
    n = len(devices)
    model = max(1, cfg.model)
    data = cfg.data if cfg.data not in (-1, 0) else n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    dcn = max(1, getattr(cfg, "dcn_data", 1))
    if dcn > 1:
        from jax.experimental import mesh_utils

        if data % dcn:
            raise ValueError(f"data axis {data} not divisible by dcn_data {dcn}")
        # real TPU multislice exposes multiple distinct slice_index values;
        # elsewhere (multi-host CPU/GPU, where every device reports slice 0
        # or none) processes are the DCN granules
        slice_ids = {getattr(d, "slice_index", None) for d in devices}
        granule_by_slice = None not in slice_ids and len(slice_ids) > 1
        arr = mesh_utils.create_hybrid_device_mesh(
            (data // dcn, model), (dcn, 1), devices,
            process_is_granule=not granule_by_slice,
        )
    else:
        arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading batch axis across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """Batch-axis-shard the array leaves of a (process-local) batch dict.

    Single process: plain ``device_put``. Multi-process: the values are this
    process's contiguous slice of the global batch and are assembled into
    global arrays without any cross-host transfer."""
    sh = batch_sharding(mesh)
    multiproc = jax.process_count() > 1
    out = {}
    for k, v in batch.items():
        if isinstance(v, np.ndarray):
            if multiproc:
                out[k] = jax.make_array_from_process_local_data(sh, v)
            else:
                out[k] = jax.device_put(v, sh)
        else:
            out[k] = v
    return out


# --------------------------------------------------------------------------
# FSDP: parameter / optimizer-state sharding on the model axis
# --------------------------------------------------------------------------


def _leaf_spec(x, model_size: int) -> P:
    """PartitionSpec sharding the largest dimension divisible by the model
    axis; scalars and indivisible leaves replicate. Adam's mu/nu mirror the
    param shapes, so the same rule shards optimizer state consistently."""
    shape = getattr(x, "shape", ())
    if len(shape) == 0 or model_size <= 1:
        return P()
    dims = [d for d in range(len(shape)) if shape[d] % model_size == 0 and shape[d] >= model_size]
    if not dims:
        return P()
    best = max(dims, key=lambda d: shape[d])
    spec = [None] * len(shape)
    spec[best] = MODEL_AXIS
    return P(*spec)


def fsdp_specs(tree, mesh: Mesh):
    """A PartitionSpec pytree for FSDP sharding of params/opt-state leaves."""
    model_size = mesh.shape[MODEL_AXIS]
    return jax.tree_util.tree_map(lambda x: _leaf_spec(x, model_size), tree)


# --------------------------------------------------------------------------
# Tensor parallelism: Megatron-style weight sharding on the model axis
# --------------------------------------------------------------------------
#
# The reference has no TP at all (SURVEY.md §2.6: "TP: absent") — the model
# axis here is a capability the reference cannot express. Sharding is
# declarative: the QKV projections and the FFN input matmul are
# column-parallel (output features sharded, so the per-head attention
# einsums that follow are head-local on each shard), the FFN output matmul
# is row-parallel (contraction dim sharded; the partitioner turns the
# partial sums into a psum over ICI). Everything that normalizes over the
# full feature axis (LayerNorms, StylizationBlock gates, embeddings, output
# heads, the frozen CLIP tower) stays replicated — GSPMD inserts the
# gather at those boundaries. Adam's mu/nu mirror the param tree paths, so
# the same name-based rule shards optimizer state consistently.

_TP_COLUMN = ("query", "key", "value", "linear1")
_TP_ROW = ("linear2",)


def _path_names(path) -> list[str]:
    return [str(getattr(k, "key", getattr(k, "name", ""))) for k in path]


def _tp_leaf_spec(path, x, model_size: int) -> P:
    shape = getattr(x, "shape", ())
    names = _path_names(path)
    if model_size <= 1 or len(shape) != 2 or len(names) < 2 or names[-1] != "kernel":
        return P()
    module = names[-2]
    if module in _TP_COLUMN and shape[1] % model_size == 0 and shape[1] >= model_size:
        return P(None, MODEL_AXIS)
    if module in _TP_ROW and shape[0] % model_size == 0 and shape[0] >= model_size:
        return P(MODEL_AXIS, None)
    return P()


def tp_state_shardings(tree, mesh: Mesh):
    """NamedSharding pytree applying the Megatron column/row rule to every
    2-D kernel named query/key/value/linear1 (column) or linear2 (row);
    all other leaves replicate. Used both to place params/opt-state and as
    the train step's with_sharding_constraint target."""
    model_size = mesh.shape[MODEL_AXIS]
    return jax.tree_util.tree_map_with_path(
        lambda p, x: NamedSharding(mesh, _tp_leaf_spec(p, x, model_size)), tree
    )


def shard_state_tp(state, mesh: Mesh):
    """Place a TrainState-like pytree with tensor-parallel weight sharding."""
    return jax.tree_util.tree_map(
        host_to_global, state, tp_state_shardings(state, mesh)
    )


def sequence_sharding(mesh: Mesh) -> NamedSharding:
    """Sequence parallelism: shard the time axis of (B, actors, T, D) motion
    activations over the model axis.

    The linear-attention formulation makes this natural on TPU: the
    K-softmax normalizer and the KᵀV moment both reduce over time, so under
    a T-sharded layout the partitioner lowers them to per-shard partial
    reductions + one psum — no ring/Ulysses machinery needed. The reference
    has no sequence strategy beyond fixed windows (SURVEY.md §5)."""
    return NamedSharding(mesh, P(None, None, MODEL_AXIS, None))


def host_to_global(x, sharding: NamedSharding):
    """Place a host array (identical on every process) with ``sharding``,
    without assuming all mesh devices are addressable."""
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    x = np.asarray(x)
    return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])


def state_shardings(state, mesh: Mesh):
    """NamedSharding pytree matching :func:`shard_state`'s placement — used
    as a with_sharding_constraint target so updated states keep the FSDP
    layout across steps."""
    model_size = mesh.shape[MODEL_AXIS]
    return jax.tree_util.tree_map(
        lambda x: NamedSharding(mesh, _leaf_spec(x, model_size)), state
    )


def shard_state(state, mesh: Mesh):
    """Apply FSDP sharding to a TrainState-like pytree.

    Each floating leaf is sharded on the model axis per :func:`_leaf_spec`
    and replicated across the data axis — the SPMD partitioner inserts the
    weight all-gathers in the forward pass and reduce-scatters in the
    backward pass (the ZeRO-3 communication pattern) automatically."""
    return jax.tree_util.tree_map(
        lambda x: host_to_global(x, NamedSharding(mesh, _leaf_spec(x, mesh.shape[MODEL_AXIS]))),
        state,
    )
