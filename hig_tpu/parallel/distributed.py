"""Multi-process (multi-host) runtime.

The reference's multi-node story is torch.distributed over gloo — one
``mp.spawn``'d process per GPU plus a SLURM init path
(codes/tools/train.py:93-102, codes/options/base_options.py:77-78). The
TPU-native equivalent is one process per host: ``jax.distributed.initialize``
wires the coordination service, every jit'd computation is global SPMD over
the full device mesh, and the DDP wrapper/explicit collectives disappear
into the partitioner.

Entry points:
* On a real TPU pod slice, ``initialize()`` with no arguments autodetects
  coordinator/process topology from the TPU metadata.
* For explicit setups (tests, CPU multi-process, GPU clusters), pass
  coordinator/num_processes/process_id or set HIG_COORDINATOR /
  HIG_NUM_PROCESSES / HIG_PROCESS_ID.
"""

from __future__ import annotations

import os

import jax

_INITIALIZED = False


def initialize(
    coordinator: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Idempotent ``jax.distributed.initialize`` with env-var fallback.

    Maps the reference's ``init_dist('slurm')`` / env://-style setup
    (base_options.py:77-78) onto jax's coordination service.
    """
    global _INITIALIZED
    # NB: don't probe jax.process_count() here — it would initialize the XLA
    # backend, after which jax.distributed.initialize refuses to run.
    if _INITIALIZED or jax.distributed.is_initialized():
        _INITIALIZED = True
        return
    coordinator = coordinator or os.environ.get("HIG_COORDINATOR")
    if num_processes is None and "HIG_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["HIG_NUM_PROCESSES"])
    if process_id is None and "HIG_PROCESS_ID" in os.environ:
        process_id = int(os.environ["HIG_PROCESS_ID"])
    if coordinator is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
    else:
        # TPU pod / GKE autodetection path.
        jax.distributed.initialize()
    _INITIALIZED = True


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def is_primary() -> bool:
    """True on the process that owns logging / metric files (rank 0)."""
    return jax.process_index() == 0


def barrier(name: str = "hig_barrier") -> None:
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)
