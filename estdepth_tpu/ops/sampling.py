"""Grid sampling (bilinear / trilinear) with torch-1.2 grid_sample semantics.

The reference leans on torch grid_sample with implicit align_corners=True and
zeros padding, and additionally forces any out-of-range coordinate fully out
of bounds so border pixels never blend with padding
(/root/reference/utils/homo_utils.py:488-491 for 2D, :192-198 for 3D).

Those semantics reduce to: a sample point is *valid* iff every coordinate is
inside [0, size-1]; valid points get standard bilinear/trilinear
interpolation of in-bounds corners; invalid points are exactly zero. We
implement that as clamp + interpolate + multiply-by-valid, which is
mathematically identical and maps onto TPU-friendly clamped gathers with no
scatter or branching.

These are the jnp reference implementations; Pallas fused kernels (see
estdepth_tpu/ops/pallas/) must match them bit-for-bit-ish (fp32 tolerance).

Two padding semantics, selected by `soft`:

* soft=False (default): the HARD masking above — matches the reference ops
  that apply their own out-of-range mask after grid_sample (homo_warping,
  homo_utils.py:488-501; warp_volume's explicit 3D z mask :192-198 variant).
* soft=True: torch grid_sample's NATIVE zeros padding, where each
  out-of-bounds interpolation corner contributes zero individually, so a
  sample fades linearly to zero across the half-voxel band outside
  [0, size-1] instead of cutting hard. This is what warp_volume's plain
  F.grid_sample call does (homo_utils.py:276 — no extra mask), and it is
  numerically ROBUST at exact boundaries: a coordinate at size-1 plus one
  float ulp keeps ~full value instead of zeroing (the hard mask pseudo-
  randomly zeroes the far depth plane of every identity-motion frustum
  warp). Identity: torch zeros padding == clamped interpolation times the
  separable per-axis ramp clip(min(q + 1, size - q), 0, 1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _soft_ramp(q: jnp.ndarray, size: int) -> jnp.ndarray:
    """Per-axis zeros-padding ramp: 1 inside [0, size-1], linear to 0 over
    the 1-px band outside, 0 beyond — torch grid_sample zeros semantics."""
    return jnp.clip(jnp.minimum(q + 1.0, size - q), 0.0, 1.0)


def _gather_hw(flat_src: jnp.ndarray, iy: jnp.ndarray, ix: jnp.ndarray, width: int):
    """Gather [B, N, C] from flat_src [B, H*W, C] at integer (iy, ix) [B, N]."""
    idx = iy * width + ix
    return jnp.take_along_axis(
        flat_src, idx[..., None], axis=1, mode="promise_in_bounds"
    )


def bilinear_sample(src: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray,
                    soft: bool = False) -> jnp.ndarray:
    """Bilinear sample of src [B, H, W, C] at pixel coords x, y [B, N] -> [B, N, C].

    align_corners=True coordinates: valid range is [0, W-1] x [0, H-1];
    anything outside samples to exactly 0 (reference homo_utils.py:484-501).
    """
    b, h, w, c = src.shape
    xf = x.astype(jnp.float32)
    yf = y.astype(jnp.float32)
    valid = (xf >= 0) & (xf <= w - 1) & (yf >= 0) & (yf <= h - 1)
    fade = (
        _soft_ramp(xf, w) * _soft_ramp(yf, h)
        if soft else valid.astype(jnp.float32)
    )
    xf = jnp.clip(xf, 0.0, w - 1.0)
    yf = jnp.clip(yf, 0.0, h - 1.0)

    x0 = jnp.floor(xf)
    y0 = jnp.floor(yf)
    wx = (xf - x0).astype(src.dtype)[..., None]
    wy = (yf - y0).astype(src.dtype)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = jnp.minimum(x0i + 1, w - 1)
    y1i = jnp.minimum(y0i + 1, h - 1)

    flat = src.reshape(b, h * w, c)
    v00 = _gather_hw(flat, y0i, x0i, w)
    v01 = _gather_hw(flat, y0i, x1i, w)
    v10 = _gather_hw(flat, y1i, x0i, w)
    v11 = _gather_hw(flat, y1i, x1i, w)

    top = v00 + wx * (v01 - v00)
    bot = v10 + wx * (v11 - v10)
    out = top + wy * (bot - top)
    return out * fade[..., None].astype(src.dtype)


def trilinear_sample(
    src: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray, z: jnp.ndarray,
    soft: bool = False,
) -> jnp.ndarray:
    """Trilinear sample of src [B, D, H, W, C] at coords (x, y, z) [B, N] -> [B, N, C].

    z indexes the leading (depth-plane) axis D, x the width, y the height —
    matching the 5D grid_sample call in warp_volume (homo_utils.py:276) whose
    grid stacks (X, Y, Z) normalized over (W-1, H-1, D-1).
    Out-of-range on any axis -> exactly 0 (homo_utils.py:192-198).
    """
    b, d, h, w, c = src.shape
    xf = x.astype(jnp.float32)
    yf = y.astype(jnp.float32)
    zf = z.astype(jnp.float32)
    valid = (
        (xf >= 0)
        & (xf <= w - 1)
        & (yf >= 0)
        & (yf <= h - 1)
        & (zf >= 0)
        & (zf <= d - 1)
    )
    fade = (
        _soft_ramp(xf, w) * _soft_ramp(yf, h) * _soft_ramp(zf, d)
        if soft else valid.astype(jnp.float32)
    )
    xf = jnp.clip(xf, 0.0, w - 1.0)
    yf = jnp.clip(yf, 0.0, h - 1.0)
    zf = jnp.clip(zf, 0.0, d - 1.0)

    x0 = jnp.floor(xf)
    y0 = jnp.floor(yf)
    z0 = jnp.floor(zf)
    wx = (xf - x0).astype(src.dtype)[..., None]
    wy = (yf - y0).astype(src.dtype)[..., None]
    wz = (zf - z0).astype(src.dtype)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    z0i = z0.astype(jnp.int32)
    x1i = jnp.minimum(x0i + 1, w - 1)
    y1i = jnp.minimum(y0i + 1, h - 1)
    z1i = jnp.minimum(z0i + 1, d - 1)

    flat = src.reshape(b, d * h * w, c)

    def gather(zi, yi, xi):
        idx = (zi * h + yi) * w + xi
        return jnp.take_along_axis(
            flat, idx[..., None], axis=1, mode="promise_in_bounds"
        )

    def lerp_plane(zi):
        v00 = gather(zi, y0i, x0i)
        v01 = gather(zi, y0i, x1i)
        v10 = gather(zi, y1i, x0i)
        v11 = gather(zi, y1i, x1i)
        top = v00 + wx * (v01 - v00)
        bot = v10 + wx * (v11 - v10)
        return top + wy * (bot - top)

    front = lerp_plane(z0i)
    back = lerp_plane(z1i)
    out = front + wz * (back - front)
    return out * fade[..., None].astype(src.dtype)


def _shift1(v: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Edge-clamped +1 shift along `axis`: out[i] = v[min(i+1, n-1)]."""
    a = [slice(None)] * v.ndim
    a[axis] = slice(1, None)
    b = [slice(None)] * v.ndim
    b[axis] = slice(-1, None)
    return jnp.concatenate([v[tuple(a)], v[tuple(b)]], axis=axis)


def bilinear_sample_stacked(
    src: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray,
    soft: bool = False,
) -> jnp.ndarray:
    """bilinear_sample (same semantics, bit-exact) via a corner-stacked
    source: see trilinear_sample_stacked. Gather rows are 4C wide
    (128 lanes at C=32) — zero layout padding."""
    b, h, w, c = src.shape
    xf = x.astype(jnp.float32)
    yf = y.astype(jnp.float32)
    valid = (xf >= 0) & (xf <= w - 1) & (yf >= 0) & (yf <= h - 1)
    fade = (
        _soft_ramp(xf, w) * _soft_ramp(yf, h)
        if soft else valid.astype(jnp.float32)
    )
    xf = jnp.clip(xf, 0.0, w - 1.0)
    yf = jnp.clip(yf, 0.0, h - 1.0)
    x0 = jnp.clip(jnp.floor(xf), 0.0, max(w - 2.0, 0.0))
    y0 = jnp.clip(jnp.floor(yf), 0.0, max(h - 2.0, 0.0))
    wx = (xf - x0).astype(src.dtype)[..., None]
    wy = (yf - y0).astype(src.dtype)[..., None]

    sx = _shift1(src, 2)
    stacked = jnp.concatenate(
        [src, sx, _shift1(src, 1), _shift1(sx, 1)], axis=-1
    )  # [B, H, W, 4C]; blocks ordered (dy, dx) with dx minor

    starts = jnp.stack(
        [y0.astype(jnp.int32), x0.astype(jnp.int32)], axis=-1
    )
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(2,),
        collapsed_slice_dims=(1, 2),
        start_index_map=(1, 2),
        operand_batching_dims=(0,),
        start_indices_batching_dims=(0,),
    )
    p = jax.lax.gather(
        stacked, starts, dnums, slice_sizes=(1, 1, 1, 4 * c),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    )  # [B, N, 4C]
    q = p.reshape(p.shape[0], p.shape[1], 2, 2, c)
    top = q[:, :, 0, 0] + wx * (q[:, :, 0, 1] - q[:, :, 0, 0])
    bot = q[:, :, 1, 0] + wx * (q[:, :, 1, 1] - q[:, :, 1, 0])
    out = top + wy * (bot - top)
    return out * fade[..., None].astype(src.dtype)


def trilinear_sample_stacked(
    src: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray, z: jnp.ndarray,
    soft: bool = False,
) -> jnp.ndarray:
    """trilinear_sample (same semantics, bit-exact vs the patch form) via a
    corner-stacked source gather.

    The 8 corner-shifted (edge-clamped) copies of the volume are
    concatenated on channels, so ONE gather row of 8C contiguous elements
    (256 lanes at C=32 — a full multiple of the 128-lane tile) fetches all
    interpolation corners for a sample point. Compared to the
    (1,2,2,2,C)-slice patch gather this removes the tiny 2-sized dims whose
    T(8,128)/T(16,128) tiling padded the gather buffers 4-8x, and — the
    decisive part — turns the BACKWARD from a (1,2,2,2,C)-window
    scatter-add into a contiguous row scatter plus cheap shift transposes:
    measured on v5e at the EST shape ([2,64,64,80,32] bf16), forward is at
    parity (51.9 vs 52.9 ms through the measurement tunnel) while
    grad-wrt-src drops 3601 -> 55 ms (66x). Costs one 8x-size transient
    copy of the source volume (~335 MB at the EST shape), built with
    elementwise concats XLA schedules at HBM bandwidth.

    Starts are clamped to size-2 with the fractional weight carrying the
    boundary case (the standard corner trick), and the shifted copies are
    edge-clamped, so corner (z0+1, ...) at z0 == D-2 reads plane D-1
    exactly like the clamped-corner formula.
    """
    b, d, h, w, c = src.shape
    xf = x.astype(jnp.float32)
    yf = y.astype(jnp.float32)
    zf = z.astype(jnp.float32)
    valid = (
        (xf >= 0)
        & (xf <= w - 1)
        & (yf >= 0)
        & (yf <= h - 1)
        & (zf >= 0)
        & (zf <= d - 1)
    )
    fade = (
        _soft_ramp(xf, w) * _soft_ramp(yf, h) * _soft_ramp(zf, d)
        if soft else valid.astype(jnp.float32)
    )
    xf = jnp.clip(xf, 0.0, w - 1.0)
    yf = jnp.clip(yf, 0.0, h - 1.0)
    zf = jnp.clip(zf, 0.0, d - 1.0)
    x0 = jnp.clip(jnp.floor(xf), 0.0, max(w - 2.0, 0.0))
    y0 = jnp.clip(jnp.floor(yf), 0.0, max(h - 2.0, 0.0))
    z0 = jnp.clip(jnp.floor(zf), 0.0, max(d - 2.0, 0.0))
    wx = (xf - x0).astype(src.dtype)[..., None]
    wy = (yf - y0).astype(src.dtype)[..., None]
    wz = (zf - z0).astype(src.dtype)[..., None]

    sx = _shift1(src, 3)
    vy = [src, sx, _shift1(src, 2), _shift1(sx, 2)]  # (dy, dx) blocks
    stacked = jnp.concatenate(
        vy + [_shift1(v, 1) for v in vy], axis=-1
    )  # [B, D, H, W, 8C]; blocks ordered (dz, dy, dx) with dx minor

    starts = jnp.stack(
        [z0.astype(jnp.int32), y0.astype(jnp.int32), x0.astype(jnp.int32)],
        axis=-1,
    )
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(2,),
        collapsed_slice_dims=(1, 2, 3),
        start_index_map=(1, 2, 3),
        operand_batching_dims=(0,),
        start_indices_batching_dims=(0,),
    )
    p = jax.lax.gather(
        stacked, starts, dnums, slice_sizes=(1, 1, 1, 1, 8 * c),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    )  # [B, N, 8C]
    q = p.reshape(p.shape[0], p.shape[1], 2, 2, 2, c)

    def lerp_plane(r):  # [B, N, 2, 2, C] -> [B, N, C]
        top = r[:, :, 0, 0] + wx * (r[:, :, 0, 1] - r[:, :, 0, 0])
        bot = r[:, :, 1, 0] + wx * (r[:, :, 1, 1] - r[:, :, 1, 0])
        return top + wy * (bot - top)

    front = lerp_plane(q[:, :, 0])
    back = lerp_plane(q[:, :, 1])
    out = front + wz * (back - front)
    return out * fade[..., None].astype(src.dtype)


def bilinear_sample_patch(
    src: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray,
    soft: bool = False,
) -> jnp.ndarray:
    """bilinear_sample (same semantics) via ONE 2x2xC patch gather — 4x
    fewer gather index rows; see trilinear_sample_patch."""
    b, h, w, c = src.shape
    xf = x.astype(jnp.float32)
    yf = y.astype(jnp.float32)
    valid = (xf >= 0) & (xf <= w - 1) & (yf >= 0) & (yf <= h - 1)
    fade = (
        _soft_ramp(xf, w) * _soft_ramp(yf, h)
        if soft else valid.astype(jnp.float32)
    )
    xf = jnp.clip(xf, 0.0, w - 1.0)
    yf = jnp.clip(yf, 0.0, h - 1.0)

    x0 = jnp.clip(jnp.floor(xf), 0.0, max(w - 2.0, 0.0))
    y0 = jnp.clip(jnp.floor(yf), 0.0, max(h - 2.0, 0.0))
    wx = (xf - x0).astype(src.dtype)[..., None]
    wy = (yf - y0).astype(src.dtype)[..., None]

    starts = jnp.stack(
        [y0.astype(jnp.int32), x0.astype(jnp.int32)], axis=-1
    )  # [B, N, 2]
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(2, 3, 4),          # the (2, 2, C) patch dims
        collapsed_slice_dims=(),
        start_index_map=(1, 2),         # indices are (y, x)
        operand_batching_dims=(0,),
        start_indices_batching_dims=(0,),
    )
    p = jax.lax.gather(
        src, starts, dnums, slice_sizes=(1, 2, 2, c),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    )  # [B, N, 2, 2, C]

    top = p[:, :, 0, 0] + wx * (p[:, :, 0, 1] - p[:, :, 0, 0])
    bot = p[:, :, 1, 0] + wx * (p[:, :, 1, 1] - p[:, :, 1, 0])
    out = top + wy * (bot - top)
    return out * fade[..., None].astype(src.dtype)


def trilinear_sample_patch(
    src: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray, z: jnp.ndarray,
    soft: bool = False,
) -> jnp.ndarray:
    """trilinear_sample (same semantics) via ONE patch gather.

    Instead of 8 pointwise gathers (one per interpolation corner), gather a
    single 2x2x2xC patch per voxel (jax.lax.gather slice_sizes) — 8x fewer
    gather index rows for the same bytes, which the TPU gather engine
    prefers (measured ~25-40% faster than the 8-gather form at the EST
    shapes). Starts are clamped to size-2 with the fractional weight
    carrying the boundary case (at coord == size-1: start size-2, weight 1
    selects the last texel — the standard corner trick, exactly equal to
    the clamped-corner formula).
    """
    b, d, h, w, c = src.shape
    xf = x.astype(jnp.float32)
    yf = y.astype(jnp.float32)
    zf = z.astype(jnp.float32)
    valid = (
        (xf >= 0)
        & (xf <= w - 1)
        & (yf >= 0)
        & (yf <= h - 1)
        & (zf >= 0)
        & (zf <= d - 1)
    )
    fade = (
        _soft_ramp(xf, w) * _soft_ramp(yf, h) * _soft_ramp(zf, d)
        if soft else valid.astype(jnp.float32)
    )
    xf = jnp.clip(xf, 0.0, w - 1.0)
    yf = jnp.clip(yf, 0.0, h - 1.0)
    zf = jnp.clip(zf, 0.0, d - 1.0)

    x0 = jnp.clip(jnp.floor(xf), 0.0, max(w - 2.0, 0.0))
    y0 = jnp.clip(jnp.floor(yf), 0.0, max(h - 2.0, 0.0))
    z0 = jnp.clip(jnp.floor(zf), 0.0, max(d - 2.0, 0.0))
    wx = (xf - x0).astype(src.dtype)[..., None]
    wy = (yf - y0).astype(src.dtype)[..., None]
    wz = (zf - z0).astype(src.dtype)[..., None]

    starts = jnp.stack(
        [z0.astype(jnp.int32), y0.astype(jnp.int32), x0.astype(jnp.int32)],
        axis=-1,
    )  # [B, N, 3]
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(2, 3, 4, 5),       # the (2, 2, 2, C) patch dims
        collapsed_slice_dims=(),
        start_index_map=(1, 2, 3),      # indices are (z, y, x)
        operand_batching_dims=(0,),
        start_indices_batching_dims=(0,),
    )
    p = jax.lax.gather(
        src, starts, dnums, slice_sizes=(1, 2, 2, 2, c),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    )  # [B, N, 2, 2, 2, C]

    def lerp_plane(q):  # [B, N, 2, 2, C] -> [B, N, C]
        top = q[:, :, 0, 0] + wx * (q[:, :, 0, 1] - q[:, :, 0, 0])
        bot = q[:, :, 1, 0] + wx * (q[:, :, 1, 1] - q[:, :, 1, 0])
        return top + wy * (bot - top)

    front = lerp_plane(p[:, :, 0])
    back = lerp_plane(p[:, :, 1])
    out = front + wz * (back - front)
    return out * fade[..., None].astype(src.dtype)
