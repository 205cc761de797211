"""Platform selection helper for CLI tools.

The machine image's sitecustomize force-selects the TPU backend regardless
of JAX_PLATFORMS; ESTDEPTH_PLATFORM=cpu (optionally with
ESTDEPTH_CPU_DEVICES=N for a virtual mesh) restores control for tests and
CPU smoke runs. Must be called before first jax backend use.
"""

from __future__ import annotations

import os


def enable_compilation_cache():
    """Persistent XLA compilation cache for CLI tools and bench.

    Compiles through this environment's remote relay cost minutes per
    program; the on-disk cache makes re-runs (and the driver's round-end
    bench) near-instant. Disable with ESTDEPTH_NO_COMPILE_CACHE=1.
    """
    if os.environ.get("ESTDEPTH_NO_COMPILE_CACHE"):
        return
    import jax

    cache_dir = os.environ.get(
        "ESTDEPTH_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "estdepth_jax"),
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax or backend without cache support


def apply_platform_env():
    platform = os.environ.get("ESTDEPTH_PLATFORM")
    enable_compilation_cache()
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
