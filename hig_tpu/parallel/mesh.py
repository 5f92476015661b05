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
