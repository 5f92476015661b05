"""Profiling / observability utilities.

The reference has no tracing at all — wall-clock prints only (SURVEY.md §5).
Here: a context manager around ``jax.profiler`` for device traces viewable
in TensorBoard/Perfetto, and a lightweight step timer that logs percentile
step latencies to the experiment's metrics stream.
"""

from __future__ import annotations

import contextlib
import json
import os
import time

import jax
import numpy as np


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture an XLA device trace (open in TensorBoard or Perfetto)."""
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Collects per-step wall times; dumps p50/p90/p99 + throughput."""

    def __init__(self, items_per_step: int = 0):
        self.times: list[float] = []
        self.items_per_step = items_per_step
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)

    def summary(self) -> dict:
        if not self.times:
            return {}
        arr = np.asarray(self.times)
        out = {
            "steps": len(arr),
            "p50_ms": float(np.percentile(arr, 50) * 1e3),
            "p90_ms": float(np.percentile(arr, 90) * 1e3),
            "p99_ms": float(np.percentile(arr, 99) * 1e3),
            "mean_ms": float(arr.mean() * 1e3),
        }
        if self.items_per_step:
            out["items_per_sec"] = float(self.items_per_step / arr.mean())
        return out

    def dump(self, path: str) -> None:
        with open(path, "a") as f:
            f.write(json.dumps(self.summary()) + "\n")
