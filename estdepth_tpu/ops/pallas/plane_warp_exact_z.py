"""Exact-z frustum warp on the Pallas lane-gather kernels.

Same math as ops/warp_exact_z.py (module doc there has the derivation),
mapped onto the lane-gather two-pass machinery of ops/pallas/plane_warp.py:

  K1'  tap+slope: one kernel emits the corner cell's z-slope
       s = V[z0+1] - V[z0] and its zero-index extrapolation
       A = V[z0] - z0 * s — the plane-mix z-lerp already gathers both
       taps, so this costs only the extra output write
  K2/K3 two-pass: the existing pass-1/pass-2 kernels resample the
       [A | s] channel stack (2C f32 channels)
  post: out = A~ + zi* * s~, gated by the exact OOB rule at zi*
       (plain XLA elementwise, fuses)

Two transports for the (A, s) pair:

  f32 (default): A and s ride the two-pass as a 2C f32 channel stack —
      the accuracy mode, deviating from the XLA exact-z formulation only
      by the shared two-pass sub-pixel x term.
  packed (opt-in): A and s ride as RNE-bf16 HALVES of ONE int32 lane per
      channel (plane_warp._pack2) — the same int32-packed machinery as
      the plain kernels, halving K1's output writes, both transposes and
      the K2/K3 gather traffic back to plain plane-mix cost.  Naively
      this would be unusable: A = v0 - z0 * s carries the z0 * s cross
      term (|z0| up to Z-1), so a bf16 lane quantizes it at up to
      Z * 2^-9 relative of s — larger than the deviation exact-z
      removes.  The fix is an ORIGIN SHIFT, exact in infinite precision:
      per plane map, extrapolate to the map's own mean z index z_bar
      instead of index 0,

        A'(c) = v0(c) + (z_bar - z0(c)) s(c)
        out   = A'~ + (zi* - z_bar) s~

      (z_bar constant per map, so the corner-straddle covariance is
      still carried exactly — this is NOT the rejected m~/zi~ blend in
      ops/warp_exact_z.py's module doc, which varies the origin per
      pixel).  |z_bar - z0| is the zi field's in-image spread (a few
      planes for real inter-frame motion, never the full Z range), so
      bf16's 2^-9 relative error now scales with the VOLUME's own
      magnitude — measured ~1e-4-class end-to-end vs f32 exact-z
      (tests/test_exact_z_warp.py pins the op-level bound; PARITY.md
      the end-to-end one).

Cost at the flagship EST shape: f32 runs the two-pass on a 2C stack
instead of plane-mix's C — still far below the 26.9 ms exact trilinear
gather — while the z deviation drops from first to second order (the
remaining drift is the two-pass sub-pixel x deviation, which the
correction tracks consistently because A and s ride the SAME two-pass).
The packed transport restores plain plane-mix kernel cost.

Trainable via the same pattern as the other kernels: custom VJP = the
XLA exact-z formulation's gradient w.r.t. the volume at identical
coordinates (sampling is linear in the source, so that IS the exact-z
cotangent scatter), zero coordinate/pose cotangents (the reference's
no_grad grid math, homo_utils.py:468).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from estdepth_tpu.ops.pallas.plane_warp import (
    _HI,
    _P,
    _bc,
    _check_lane_fit,
    _corner,
    _interpret,
    _line_coeffs,
    _pack2,
    _row_tile,
    _two_pass,
)
from estdepth_tpu.ops.warp_exact_z import (
    apply_exact_z_correction,
    zi_field,
)


def _tap_slope_kernel(vt_ref, zi_ref, a_ref, s_ref):
    # vt [1, N, Z] f32; zi [1, N, D] f32; A/s [1, N, D] f32
    # Corner z is clamped (exact-sampler rule), never zeroed; per-voxel
    # validity is applied downstream at zi* (apply_exact_z_correction).
    v = vt_ref[0]
    zi = zi_ref[0]
    z = v.shape[-1]
    i0, _ = _corner(zi, z)
    g0 = jnp.take_along_axis(v, i0, axis=1)
    g1 = jnp.take_along_axis(v, i0 + 1, axis=1)
    s = g1 - g0
    a_ref[0] = g0 - i0.astype(jnp.float32) * s
    s_ref[0] = s


def _tap_slope_packed_kernel(vt_ref, zi_ref, zbar_ref, out_ref):
    # vt [1, N, Z] f32; zi [1, N, D] f32; zbar [1, 1, D] f32;
    # out [1, N, D] int32 bf16 pairs (low = A', high = s)
    # A' is extrapolated to the map's own origin z_bar (module doc) so the
    # bf16 half stays at the volume's own magnitude.
    v = vt_ref[0]
    zi = zi_ref[0]
    zbar = zbar_ref[0, 0]
    z = v.shape[-1]
    i0, _ = _corner(zi, z)
    g0 = jnp.take_along_axis(v, i0, axis=1)
    g1 = jnp.take_along_axis(v, i0 + 1, axis=1)
    s = g1 - g0
    aprime = g0 + (zbar[None, :] - i0.astype(jnp.float32)) * s
    out_ref[0] = _pack2(aprime, s)


def _frustum_exact_z_impl(
    volume: jnp.ndarray,       # [B, D, H, W, C]
    t: jnp.ndarray,            # [B, 4, 4]
    cam_intr: jnp.ndarray,     # [B, 3, 3]
    depth_values: jnp.ndarray,  # [B, D]
    depth_min: float,
    depth_interval: float,
    grid: jnp.ndarray,         # [3, H*W]
    x: jnp.ndarray,            # [B, D*H*W]
    y: jnp.ndarray,            # [B, D*H*W]
    z: jnp.ndarray,            # [B, D*H*W] exact source depth
    packed: bool = False,
) -> jnp.ndarray:
    b, d, h, w, c = volume.shape
    _check_lane_fit(depth=d, height=h, width=w)
    f32 = jnp.float32
    dtype = volume.dtype

    zi = zi_field(t, cam_intr, depth_values, depth_min, depth_interval,
                  grid)  # [B, D, HW]

    # ---- K1': tap + slope lane gathers (see plane_warp._frustum_impl) ----
    zi_t = jnp.transpose(zi, (0, 2, 1))  # [B, HW, D]
    vt = jnp.transpose(
        volume.astype(f32).reshape(b, d, h * w, c), (0, 3, 2, 1)
    ).reshape(b * c, h * w, d)

    tile = _row_tile(h * w, d)
    zbar = None

    def to_maps(arr):
        return jnp.transpose(
            arr.reshape(b, c, h, w, d), (0, 4, 2, 1, 3)
        )  # [B, D, H, C, W]

    if packed:
        # per-map A-field origin: the map's mean in-range z index (the
        # conditioning shift, module doc; any per-map constant is exact).
        # Validity-weighted: invalid/behind-camera pixels carry the -2.0
        # sentinel and would drag the origin toward plane 0 on mostly
        # out-of-frustum maps, weakening the conditioning the shift exists
        # for. Carried [B, 1, D] so the block's trailing two dims (1, d)
        # equal the array's — the TPU lowering's block-shape rule for dims
        # that aren't 8/128 multiples.
        valid = zi >= 0.0
        zbar = jnp.sum(
            jnp.where(valid, jnp.clip(zi, 0.0, d - 1.0), 0.0), axis=2
        ) / jnp.maximum(jnp.sum(valid, axis=2), 1.0)  # [B, D]
        pair = pl.pallas_call(
            _tap_slope_packed_kernel,
            out_shape=jax.ShapeDtypeStruct((b * c, h * w, d), jnp.int32),
            grid=(b * c, (h * w) // tile),
            in_specs=[
                pl.BlockSpec((1, tile, d), lambda i, j: (i, j, 0)),
                pl.BlockSpec(
                    (1, tile, d), lambda i, j, cc=c: (i // cc, j, 0)
                ),
                pl.BlockSpec(
                    (1, 1, d), lambda i, j, cc=c: (i // cc, 0, 0)
                ),
            ],
            out_specs=pl.BlockSpec((1, tile, d), lambda i, j: (i, j, 0)),
            interpret=_interpret(),
        )(vt, zi_t, zbar[:, None, :])
        # [B*C, HW, D] int32 pairs -> per-plane maps [B*D, H, C, W]
        maps_t = to_maps(pair).reshape(b * d, h, c, w)
    else:
        afield, slope = pl.pallas_call(
            _tap_slope_kernel,
            out_shape=(
                jax.ShapeDtypeStruct((b * c, h * w, d), f32),
                jax.ShapeDtypeStruct((b * c, h * w, d), f32),
            ),
            grid=(b * c, (h * w) // tile),
            in_specs=[
                pl.BlockSpec((1, tile, d), lambda i, j: (i, j, 0)),
                pl.BlockSpec(
                    (1, tile, d), lambda i, j, cc=c: (i // cc, j, 0)
                ),
            ],
            out_specs=(
                pl.BlockSpec((1, tile, d), lambda i, j: (i, j, 0)),
                pl.BlockSpec((1, tile, d), lambda i, j: (i, j, 0)),
            ),
            interpret=_interpret(),
        )(vt, zi_t)

        # [B*C, HW, D] x2 -> per-plane [A | s] maps [B*D, H, 2*C, W]
        maps_t = jnp.concatenate(
            [to_maps(afield), to_maps(slope)], axis=3
        ).reshape(b * d, h, 2 * c, w)

    # ---- per-plane homographies (identical to plane_warp._frustum_impl) --
    rot = t[:, :3, :3]
    trans = t[:, :3, 3]
    k_inv = jnp.linalg.inv(cam_intr)
    m0 = jnp.einsum("bij,bjk->bik", rot, k_inv, precision=_P)
    krk = jnp.einsum("bij,bjk->bik", cam_intr.astype(f32), m0, precision=_P)
    kt = jnp.einsum("bij,bj->bi", cam_intr.astype(f32), trans, precision=_P)
    hmat = depth_values[:, :, None, None].astype(f32) * krk[:, None]
    hmat = hmat.at[:, :, :, 2].add(kt[:, None, :])
    ab = _line_coeffs(hmat.reshape(b * d, 3, 3), w)

    # ---- K2 + K3: resample the [A | s] stack ------------------------------
    yq = jnp.transpose(y.astype(f32).reshape(b * d, h, w), (0, 2, 1))
    xv = jnp.transpose(x.astype(f32).reshape(b * d, h, w), (0, 2, 1))
    as_t = _two_pass(maps_t, ab, yq, xv, planes_per_map=1, packed=packed)
    # packed: [B*D, Hout, W, C] int32 pairs; else [B*D, Hout, W, 2*C] f32

    zi_star = (z.astype(f32) - depth_min) / depth_interval
    zi_star = zi_star.reshape(b * d, h * w)
    if packed:
        a_t = _bc(as_t << 16, f32).reshape(b * d, h * w, c)
        s_t = _bc(as_t & _HI, f32).reshape(b * d, h * w, c)
        origin = zbar.reshape(b * d)
    else:
        a_t = as_t[..., :c].reshape(b * d, h * w, c)
        s_t = as_t[..., c:].reshape(b * d, h * w, c)
        origin = None
    out = apply_exact_z_correction(
        a_t, s_t, zi_star, d, dtype, z_origin=origin,
    )
    return out.reshape(b, d, h, w, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _frustum_exact_z_diff(depth_min, depth_interval, packed, volume, t,
                          cam_intr, depth_values, grid, x, y, z):
    return _frustum_exact_z_impl(volume, t, cam_intr, depth_values,
                                 depth_min, depth_interval, grid, x, y, z,
                                 packed=packed)


def _frustum_exact_z_fwd(depth_min, depth_interval, packed, volume, t,
                         cam_intr, depth_values, grid, x, y, z):
    out = _frustum_exact_z_impl(volume, t, cam_intr, depth_values,
                                depth_min, depth_interval, grid, x, y, z,
                                packed=packed)
    return out, (volume, t, cam_intr, depth_values, grid, x, y, z)


def _frustum_exact_z_bwd(depth_min, depth_interval, packed, res, ct):
    # packed or not, the VJP is the XLA exact-z formulation's gradient
    # w.r.t. the volume at identical coordinates (the pack/unpack RNE
    # quantizers are piecewise-identity, same pattern as plane_warp.py's
    # packed kernels)
    from estdepth_tpu.ops.warp_exact_z import frustum_warp_exact_z

    volume, t, cam_intr, depth_values, grid, x, y, z = res
    _, vjp = jax.vjp(
        lambda v: frustum_warp_exact_z(
            v, t, cam_intr, depth_values, depth_min, depth_interval,
            grid, x, y, z,
        ),
        volume,
    )
    (dvol,) = vjp(ct)
    zl = jnp.zeros_like
    return (dvol, zl(t), zl(cam_intr), zl(depth_values), zl(grid),
            zl(x), zl(y), zl(z))


_frustum_exact_z_diff.defvjp(_frustum_exact_z_fwd, _frustum_exact_z_bwd)


def frustum_warp_exact_z_pallas(
    volume, t, cam_intr, depth_values, depth_min: float,
    depth_interval: float, grid, x, y, z, packed: bool = False,
) -> jnp.ndarray:
    """Differentiable entry: Pallas forward, XLA-exact-z-VJP backward.

    packed=True rides the (A, s) pair as bf16 halves of one int32 lane
    with the per-map origin shift (module doc) — plain plane-mix kernel
    cost for a ~1e-4-class quantization of the corrected value.
    """
    return _frustum_exact_z_diff(
        float(depth_min), float(depth_interval), bool(packed), volume, t,
        cam_intr, depth_values, grid, x, y, z,
    )
