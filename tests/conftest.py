"""Test harness: run everything on a virtual 8-device CPU mesh.

The reference has no fake backend for its distributed paths (SURVEY.md §4);
this conftest is ours — multi-chip sharding is exercised on 8 virtual CPU
devices so the full dp/tp sharding surface compiles and runs without TPU
hardware.

NOTE: this environment's site hook (axon) imports jax at interpreter
startup, so env vars like JAX_PLATFORMS set here are already too late —
use jax.config.update, which works any time before first backend use.
"""

import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest


@pytest.fixture(scope="session")
def synth_root(tmp_path_factory):
    """One synthetic NTU-format dataset shared by all test modules."""
    root = str(tmp_path_factory.mktemp("synth") / "data")
    from hig_tpu.data.synthetic import generate_dataset

    generate_dataset(root, clips_per_class=2, min_frames=26, max_frames=40, seed=0)
    return root
