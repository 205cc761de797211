"""resolve_warp_args (estdepth_tpu/config.py): the eval tools' tri-state
warp flags resolve to the parity-gated fast default (PARITY.md 1.19e-7)
— pallas+exact-z on TPU, plane-mix+exact-z elsewhere — with --exact-warp
restoring reference trilinear semantics and plain-bool namespaces (older
tools, tests) passing through untouched. Tests run on the CPU backend,
so "auto" resolves to the plane-mix branch here.
"""
import argparse

from estdepth_tpu.config import resolve_warp_args


def _ns(**kw):
    base = dict(fast_frustum=None, pallas_warp=None, exact_z=None,
                packed_warp=None, exact_warp=False)
    base.update(kw)
    return argparse.Namespace(**base)


def test_auto_default_is_fast_with_exact_z():
    ns = _ns()
    resolve_warp_args(ns)
    # CPU backend in tests -> the XLA plane-mix exact-z branch
    assert ns.fast_frustum is True
    assert ns.pallas_warp is False
    assert ns.exact_z is True
    # the packed transport only exists on the Pallas exact-z path
    assert ns.packed_warp is False


def test_exact_warp_disables_everything():
    ns = _ns(exact_warp=True)
    resolve_warp_args(ns)
    assert (ns.fast_frustum, ns.pallas_warp, ns.exact_z,
            ns.packed_warp) == (False, False, False, False)


def test_explicit_fast_warp_gets_exact_z():
    ns = _ns(pallas_warp=True)
    resolve_warp_args(ns)
    assert (ns.fast_frustum, ns.pallas_warp, ns.exact_z) == (
        False, True, True)
    # pallas + exact-z resolved ON -> the packed transport defaults ON
    # (the TPU shipped default; 1.22x scan, 6.56e-7 parity — PARITY.md)
    assert ns.packed_warp is True


def test_explicit_no_packed_respected():
    ns = _ns(pallas_warp=True, packed_warp=False)
    resolve_warp_args(ns)
    assert (ns.pallas_warp, ns.exact_z, ns.packed_warp) == (
        True, True, False)


def test_explicit_no_exact_z_respected():
    ns = _ns(pallas_warp=True, exact_z=False)
    resolve_warp_args(ns)
    assert (ns.fast_frustum, ns.pallas_warp, ns.exact_z) == (
        False, True, False)
    # no exact-z -> nothing for the packed transport to ride
    assert ns.packed_warp is False


def test_plain_bool_namespace_passthrough():
    ns = _ns(fast_frustum=False, pallas_warp=False, exact_z=False)
    resolve_warp_args(ns)
    assert (ns.fast_frustum, ns.pallas_warp, ns.exact_z) == (
        False, False, False)


def test_namespace_without_warp_attrs_stays_exact():
    ns = argparse.Namespace()
    resolve_warp_args(ns)
    assert ns.pallas_warp is False and ns.fast_frustum is False


def test_apply_matmul_precision():
    """--precision on the eval tools (utils/platform.py): 'default'/None
    are no-ops; 'high'/'highest' set the global jax default (the knob
    that removes the TPU backend's model-wide ~1.15e-3 default-precision
    parity term — PARITY.md's on-chip table)."""
    import jax

    from estdepth_tpu.utils.platform import apply_matmul_precision

    old = jax.config.jax_default_matmul_precision
    try:
        apply_matmul_precision("high")
        assert jax.config.jax_default_matmul_precision == "high"
        apply_matmul_precision(None)  # no-op: keeps the current setting
        apply_matmul_precision("default")  # also a no-op by contract
        assert jax.config.jax_default_matmul_precision == "high"
        apply_matmul_precision("highest")
        assert jax.config.jax_default_matmul_precision == "highest"
    finally:
        jax.config.update("jax_default_matmul_precision", old)
