"""Persistent XLA compilation cache setup.

First compiles over this environment's remote-compile TPU tunnel cost
minutes; the file-backed compilation cache makes every later process (tests,
bench, the driver's runs) reuse them. Call :func:`enable` before the first
jit execution.
"""

from __future__ import annotations

import os

import jax

DEFAULT_DIR = os.environ.get(
    "HIG_TPU_COMPILATION_CACHE", os.path.expanduser("~/.cache/hig_tpu_xla")
)


def enable(cache_dir: str | None = None) -> str:
    cache_dir = cache_dir or DEFAULT_DIR
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir
