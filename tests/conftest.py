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

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
