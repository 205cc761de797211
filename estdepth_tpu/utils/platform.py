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


def apply_matmul_precision(name: str | None) -> None:
    """Set the GLOBAL default matmul/conv precision ('default', 'high',
    'highest').

    On TPU, f32 matmuls and convs run ONE bf16 pass by default; vs the
    torch-f32 reference that is a model-wide ~1.15e-3 end-metric abs_rel
    drift shared by every warp variant including `exact` (PARITY.md).
    'high' (3 bf16 passes) measures 1.4e-5 on the on-chip parity gate,
    'highest' (6 passes) 8.0e-7 — both PASS the 1e-3 gate, at extra
    MXU cost on every conv. Ops that need exact coordinates (geometry,
    exact-z taps) always pin precision=HIGHEST explicitly and are not
    affected by this knob. No-op for None/'default'/''.
    """
    if name in (None, "", "default"):
        return
    import jax

    jax.config.update("jax_default_matmul_precision", name)


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
