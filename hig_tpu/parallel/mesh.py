"""Device mesh + sharding rules.

The reference's entire distributed layer is single-host DDP over gloo with
an implicit gradient all-reduce (SURVEY.md §2.6). Here it is a
``jax.sharding.Mesh`` with a ``data`` axis (batch sharding; XLA fuses the
gradient all-reduce into the backward pass over ICI) and a ``model`` axis
reserved for tensor/FSDP sharding. At reference scale (≈35M trainable
params) DP is sufficient; the mesh API leaves axis room per SURVEY.md §2.6.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hig_tpu.config import MeshConfig

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(cfg: MeshConfig | None = None, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    cfg = cfg or MeshConfig()
    n = len(devices)
    model = max(1, cfg.model)
    data = cfg.data if cfg.data not in (-1, 0) else n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading batch axis across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """Device-put array leaves of a batch dict with batch-axis sharding."""
    sh = batch_sharding(mesh)
    out = {}
    for k, v in batch.items():
        if isinstance(v, np.ndarray):
            out[k] = jax.device_put(v, sh)
        else:
            out[k] = v
    return out
