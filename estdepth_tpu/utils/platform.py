"""Platform selection helper for CLI tools.

The machine image's sitecustomize force-selects the TPU backend regardless
of JAX_PLATFORMS; ESTDEPTH_PLATFORM=cpu (optionally with
ESTDEPTH_CPU_DEVICES=N for a virtual mesh) restores control for tests and
CPU smoke runs. Must be called before first jax backend use.
"""

from __future__ import annotations

import os


def apply_platform_env():
    platform = os.environ.get("ESTDEPTH_PLATFORM")
    if not platform:
        return
    n = os.environ.get("ESTDEPTH_CPU_DEVICES")
    if n and "xla_force_host_platform_device_count" not in os.environ.get(
        "XLA_FLAGS", ""
    ):
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={n}"
        ).strip()
    import jax

    jax.config.update("jax_platforms", platform)
