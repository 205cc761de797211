"""Test harness: run everything on a virtual 8-device CPU mesh.

This is the TPU-world equivalent of a fake multi-node backend (SURVEY.md §4):
sharding/collective code paths compile and execute without real chips.
Must set env vars before the first jax import.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The machine image's sitecustomize may force jax_platforms to the TPU
# backend, overriding the env var; override it back before backend init.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite compiles dozens of model variants;
# re-runs hit the cache instead of recompiling (~10 min -> ~2 min).
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
