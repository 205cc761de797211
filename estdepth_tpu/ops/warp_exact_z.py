"""Exact-z plane-mix frustum warp (XLA formulation).

The plane-mix frustum resample (ops/warp._frustum_warp_planemix) evaluates
the z-interpolation index at the 2x2 bilinear CORNER pixels instead of the
continuous sample point — the dominant term of its ~1.1e-3 abs_rel drift
vs the reference's exact trilinear (`/root/reference/utils/homo_utils.py:188`
evaluates z continuously; PARITY.md quantifies the gap).

This module removes that deviation to SECOND order while keeping the
plane-mix structure (dense z-mix on the MXU + one 2D gather per voxel).
Per corner pixel c, extend the corner's z-cell linearly to the EXACT
per-voxel index zi*(p) (the z the exact path already projects):

  exact trilinear:  out(p) = sum_c w_c(p) * lerp_z(V[:, c], zi*(p))
  plane-mix:        out(p) = sum_c w_c(p) * lerp_z(V[:, c], zi(c))
  exact-z:          out(p) = sum_c w_c(p) * [ v0(c) + (zi*(p) - z0(c)) s(c) ]

with z0(c) the corner's z-cell base, v0(c) = V[z0(c), c] its lower tap and
s(c) = V[z0(c)+1, c] - V[z0(c), c] its slope.  The blend is computed
EXACTLY — including the (z0, s) cross term that varies across corners at
z-cell straddles — by blending just two fields:

  A(c) = v0(c) - z0(c) * s(c)          ->   out(p) = A~(p) + zi*(p) * s~(p)

(~ = the same bilinear resample, applied channelwise).  A naive blended
correction m~ + (zi* - zi~) s~ does NOT work: bilinear interpolation of the
(affine-in-pixel) zi field already reproduces zi* to first order, so
sum_c w_c (zi* - zi(c)) ~ 0 and the corner-straddle covariance
sum_c w_c zi(c) s(c) - zi~ s~ — the actual plane-mix error — is dropped.
The A/s form carries it exactly.

Residual error vs exact trilinear is second order: nonzero only where
zi*(p) and zi(c) straddle a z-cell boundary, bounded there by
|zi* - zi(c)| times the slope DIFFERENCE of the adjacent cells.  For a
volume LINEAR in z, A(c) = a(c) and s(c) = b(c), so the result is the
exact trilinear everywhere all corners are z-valid
(tests/test_exact_z_warp.py pins that identity).

Numerics: A and s are built and resampled in f32 even for bf16 volumes —
A contains z0 * s (|z0| up to Z-1), so a bf16 row would amplify its 2^-8
relative quantization by the plane count.  OOB follows the EXACT
sampler's rules, not plane-mix's: corner z is CLAMPED into range (never
zeroed — validity is per voxel, not per corner), zi*(p) is clamped for
the lerp position, and an out-of-window zi*(p) hard-zeroes the voxel.

The Pallas lane-gather version of the same math lives in
ops/pallas/plane_warp_exact_z.py; this XLA formulation is its numerical
reference and supplies its backward (sampling is linear in the source
volume, so this function's vjp w.r.t. `volume` IS the exact-z cotangent
scatter).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from estdepth_tpu.ops.sampling import bilinear_sample_stacked

_P = jax.lax.Precision.HIGHEST
_EPS = 1e-3  # z-window epsilon, matches ops/warp._frustum_warp_planemix


def zi_field(
    t: jnp.ndarray,            # [B, 4, 4] target->source rigid transform
    cam_intr: jnp.ndarray,     # [B, 3, 3]
    depth_values: jnp.ndarray,  # [B, D]
    depth_min: float,
    depth_interval: float,
    grid: jnp.ndarray,         # [3, H*W] homogeneous pixel grid
) -> jnp.ndarray:
    """Fractional source-plane index of each target plane at each SOURCE
    pixel: zi[b, d, n] with -2.0 sentinel behind the camera.

    Target depth plane d is the 3D plane {A_d p} in the source frame with
    A_d = dv_d * R K^-1 (+translation in the last column); its source depth
    at source pixel q is zs = 1 / (n_d . K^-1 q) where A_d^T n_d = e3 —
    inverse-affine in q (see ops/warp._frustum_warp_planemix, which computes
    the identical field)."""
    b, d = depth_values.shape
    f32 = jnp.float32
    rot = t[:, :3, :3]
    trans = t[:, :3, 3]
    k_inv = jnp.linalg.inv(cam_intr)
    m0 = jnp.einsum("bij,bjk->bik", rot, k_inv, precision=_P)
    a = depth_values[:, :, None, None].astype(f32) * m0[:, None]
    a = a.at[:, :, :, 2].add(trans[:, None, :])
    e3 = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], f32), (b, d, 3))
    n = jnp.linalg.solve(jnp.swapaxes(a, -1, -2), e3[..., None])[..., 0]
    rays = jnp.einsum("bij,jn->bin", k_inv, grid, precision=_P)
    denom = jnp.einsum("bdi,bin->bdn", n, rays, precision=_P)  # [B, D, HW]
    zi = (1.0 / denom - depth_min) / depth_interval
    in_front = (denom > 1e-8) & jnp.isfinite(zi)
    return jnp.where(in_front, zi, -2.0)


def tap_and_slope_fields(volume: jnp.ndarray, zi: jnp.ndarray):
    """The two blendable exact-z fields per source pixel and target plane.

    volume: [B, D, H, W, C] (z-major); zi: [B, D, HW].
    Returns (a, s): f32 [B, D, HW, C] with s the corner cell's z-slope
    V[z0+1] - V[z0] and a = V[z0] - z0 * s its zero-index extrapolation.
    The corner index is CLAMPED into range, never zeroed — the exact
    sampler's per-corner rule (ops/sampling.trilinear_sample_stacked
    clamps corner coordinates; validity is decided per VOXEL at the
    continuous point, which apply_exact_z_correction handles) — so on a
    z-linear volume A~ + clip(zi*) s~ reproduces the exact trilinear at
    EVERY voxel, boundary planes included.  Then A~ + zi* s~ is the
    exact bilinear blend of the per-corner linear extensions.
    """
    b, d, h, w, c = volume.shape
    f32 = jnp.float32
    z = d  # source planes == target planes
    z0 = jnp.clip(jnp.floor(jnp.clip(zi, 0.0, z - 1.0)), 0.0,
                  max(z - 2.0, 0.0))
    z0i = z0.astype(jnp.int32)
    # tap-selection matmuls (dense [D,Z]x[Z,C] per source pixel: MXU work).
    # precision=HIGHEST is load-bearing: the TPU's default bf16 passes
    # quantize the f32 taps at 2^-9 relative, which `a = v0 - z0 * s`
    # amplifies by |z0| (up to Z-1) — an error LARGER than the z deviation
    # this module removes. With it, the op matches the exact trilinear at
    # ~1e-6 on-chip (op-level A/B); end-to-end the TPU gate then shows
    # exact and plane_mix_exact_z within 2e-6 of EACH OTHER (the residual
    # ~1.1e-3 vs the torch reference is the model-wide conv/matmul
    # default-precision term, shared by every variant — PARITY.md).
    w0 = jax.nn.one_hot(z0i, z, dtype=f32)
    ws = jax.nn.one_hot(z0i + 1, z, dtype=f32) - w0
    src = volume.astype(f32).reshape(b, d, h * w, c)  # [B, Z, HW, C]
    v0 = jnp.einsum("bdnz,bznc->bdnc", w0, src, precision=_P)
    s = jnp.einsum("bdnz,bznc->bdnc", ws, src, precision=_P)
    a = v0 - z0[..., None] * s
    return a, s


def apply_exact_z_correction(
    a_t: jnp.ndarray,     # [P, N, C] resampled A field (f32)
    s_t: jnp.ndarray,     # [P, N, C] resampled slope field (f32)
    zi_star: jnp.ndarray,  # [P, N] exact per-voxel source plane index
    nplanes: int,
    out_dtype,
    z_origin: jnp.ndarray | None = None,  # [P] per-map A-field index origin
) -> jnp.ndarray:
    """out = A~ + (clip(zi*) - z_origin) s~, gated by the exact OOB rule.

    zi* is clamped into [0, Z-1] for the lerp position and the voxel is
    zeroed outside the epsilon-padded window — both mirror the exact
    sampler's per-voxel rule (clamp the coordinate, zero the sample;
    the epsilon pad is the plane-mix family's boundary-noise guard,
    ops/warp.py).

    `z_origin` is the per-map index origin the A field was extrapolated
    to (A = v0 + (z_origin - z0) s); the default 0 matches
    tap_and_slope_fields. A shifted origin is algebraically identical in
    f32 but keeps |A| near the volume's own scale — the conditioning the
    int32-packed bf16 kernel path needs (ops/pallas/plane_warp_exact_z.py)."""
    f32 = jnp.float32
    zc = jnp.clip(zi_star, 0.0, nplanes - 1.0)
    if z_origin is not None:
        zc = zc - z_origin.astype(f32)[:, None]
    out = a_t.astype(f32) + zc[..., None] * s_t.astype(f32)
    valid_star = (
        (zi_star >= -_EPS) & (zi_star <= nplanes - 1.0 + _EPS)
    ).astype(f32)
    return (out * valid_star[..., None]).astype(out_dtype)


def frustum_warp_exact_z(
    volume: jnp.ndarray,       # [B, D, H, W, C]
    t: jnp.ndarray,            # [B, 4, 4] target->source rigid transform
    cam_intr: jnp.ndarray,     # [B, 3, 3]
    depth_values: jnp.ndarray,  # [B, D]
    depth_min: float,
    depth_interval: float,
    grid: jnp.ndarray,         # [3, H*W]
    x: jnp.ndarray,            # [B, D*H*W] exact source x (plane-major)
    y: jnp.ndarray,            # [B, D*H*W] exact source y
    z: jnp.ndarray,            # [B, D*H*W] exact source DEPTH (not index)
) -> jnp.ndarray:
    """Exact-z plane-mix frustum resample (XLA; module doc has the math).

    Same call structure as ops/warp._frustum_warp_planemix plus the exact
    per-voxel source depth `z` that frustum_warp already projects.
    """
    b, d, h, w, c = volume.shape
    f32 = jnp.float32

    zi = zi_field(t, cam_intr, depth_values, depth_min, depth_interval,
                  grid)
    a, s = tap_and_slope_fields(volume, zi)

    # stage B: ONE bilinear row gather for the [A | s] f32 stack at the
    # exact per-voxel (x, y)
    asx = jnp.concatenate([a, s], axis=-1).reshape(b * d, h, w, 2 * c)
    x2 = x.reshape(b * d, h * w)
    y2 = y.reshape(b * d, h * w)
    as_t = bilinear_sample_stacked(asx, x2, y2)  # [B*D, HW, 2C] f32

    zi_star = (z.astype(f32) - depth_min) / depth_interval
    zi_star = zi_star.reshape(b * d, h * w)
    out = apply_exact_z_correction(
        as_t[..., :c], as_t[..., c:], zi_star, d, volume.dtype,
    )
    return out.reshape(b, d, h, w, c)
