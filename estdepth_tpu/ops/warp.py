"""Plane-sweep and frustum (cost-volume) warps.

TPU-native, batched equivalents of the reference's two hot warp ops:
  * plane_sweep_warp  <-> homo_warping (/root/reference/utils/homo_utils.py:458-504)
  * frustum_warp      <-> warp_volume  (/root/reference/utils/homo_utils.py:240-279)

Both express the projective math as batched matmuls over a static pixel grid
followed by a clamped gather interpolation (see ops/sampling.py), all with
static shapes so XLA fuses the coordinate math into the gather's index
computation. A Pallas fused version lives in ops/pallas/.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from estdepth_tpu.ops import geometry
from estdepth_tpu.ops.sampling import (
    bilinear_sample_stacked,
    trilinear_sample_stacked,
)


def plane_sweep_warp(
    src_feat: jnp.ndarray,
    src_proj: jnp.ndarray,
    ref_proj: jnp.ndarray,
    depth_values: jnp.ndarray,
    backend: str = "xla",
) -> jnp.ndarray:
    """Warp src features over fronto-parallel depth planes of the ref camera.

    Args:
      src_feat: [B, H, W, C] source-view feature map.
      src_proj / ref_proj: [B, 4, 4] K-premultiplied world->pixel projections
        (geometry.camera_projection).
      depth_values: [B, D] depth hypotheses.

    Returns:
      [B, D, H, W, C] warped feature volume; out-of-frustum samples are 0.

    Matches homo_warping: rot/trans from src_proj @ inv(ref_proj)
    (homo_utils.py:469-471), projective division with +1e-8 (:483), bilinear
    zeros-padding sampling with hard out-of-range masking (:488-501).
    """
    b, h, w, _ = src_feat.shape
    d = depth_values.shape[1]

    rot, trans = geometry.relative_projection(src_proj, ref_proj)
    grid = geometry.pixel_grid(h, w)  # [3, H*W]
    # precision=HIGHEST: the TPU default bf16 matmul would round warp
    # coordinates at pixel scale (CLAUDE.md invariant; CPU tests cannot
    # catch this — CPU ignores matmul precision)
    rot_xyz = jnp.einsum(
        "bij,jn->bin", rot, grid, precision=jax.lax.Precision.HIGHEST
    )  # [B, 3, H*W]
    # [B, 3, D, H*W]
    pts = rot_xyz[:, :, None, :] * depth_values[:, None, :, None]
    pts = pts + trans[:, :, None, None]
    zb = pts[:, 2] + 1e-8
    x = (pts[:, 0] / zb).reshape(b, d * h * w)
    y = (pts[:, 1] / zb).reshape(b, d * h * w)

    if backend == "pallas":
        # VPU lane-gather two-pass form (ops/pallas/plane_warp.py) — the
        # D per-plane homographies of one shared map, no gather engine
        from estdepth_tpu.ops.pallas.plane_warp import plane_sweep_warp_pallas

        return plane_sweep_warp_pallas(
            src_feat, rot, trans, depth_values, x, y
        )
    if backend != "xla":
        raise ValueError(f"unknown backend: {backend!r}")
    out = bilinear_sample_stacked(src_feat, x, y)  # [B, D*H*W, C]
    return out.reshape(b, d, h, w, src_feat.shape[-1])


def set_volume_border(
    volume: jnp.ndarray, border_value: float
) -> jnp.ndarray:
    """Set every face voxel of [B, D, H, W, C] to border_value.

    Equivalent of _set_vol_border (homo_utils.py:305-320), used by the
    reference's warp_volume border-padding mode (:271-275)."""
    b, d, h, w, c = volume.shape
    di = jnp.arange(d)
    hi = jnp.arange(h)
    wi = jnp.arange(w)
    border = (
        ((di == 0) | (di == d - 1))[:, None, None]
        | ((hi == 0) | (hi == h - 1))[None, :, None]
        | ((wi == 0) | (wi == w - 1))[None, None, :]
    )
    return jnp.where(
        border[None, :, :, :, None],
        jnp.asarray(border_value, volume.dtype),
        volume,
    )


def _frustum_warp_planemix(
    volume: jnp.ndarray,     # [B, D, H, W, C]
    t: jnp.ndarray,          # [B, 4, 4] target->source rigid transform
    cam_intr: jnp.ndarray,   # [B, 3, 3]
    depth_values: jnp.ndarray,  # [B, D]
    depth_min: float,
    depth_interval: float,
    grid: jnp.ndarray,       # [3, H*W] homogeneous pixel grid
    x: jnp.ndarray,          # [B, D*H*W] exact source-pixel x (plane-major)
    y: jnp.ndarray,          # [B, D*H*W] exact source-pixel y
) -> jnp.ndarray:
    """Two-stage frustum resample: dense z-mix matmul + per-plane 2D gather.

    Geometry: target depth plane d is the 3D plane {A_d p : p = (x_t,y_t,1)}
    in the source frame, with A_d = dv_d * R K^-1 (+translation in the last
    column). Its source depth at source pixel q is zs = 1 / (n_d . K^-1 q)
    where A_d^T n_d = e3 — inverse-affine, no per-voxel gather needed. So:

      stage A  M[b,d] = sum_z hat(zi_d(q) - z) * volume[b,z]   (MXU matmul)
      stage B  out[b,d] = bilinear(M[b,d]; x_d, y_d)           (2D gather)

    Deviation from the exact trilinear: the z-lerp index is evaluated at
    the 2x2 bilinear corner pixels instead of the continuous sample point
    (difference bounded by the plane's in-image depth slope per pixel,
    sub-plane-spacing for real camera motion); the out-of-z-range hard
    zeroing happens per corner for the same reason. The x/y sampling and
    OOB zeroing are the exact per-voxel values.
    """
    b, d, h, w, c = volume.shape
    f32 = jnp.float32

    rot = t[:, :3, :3]
    trans = t[:, :3, 3]
    k_inv = jnp.linalg.inv(cam_intr)
    m0 = jnp.einsum("bij,bjk->bik", rot, k_inv,
                    precision=jax.lax.Precision.HIGHEST)  # [B,3,3]
    # A_d = dv_d * m0, translation added to the homogeneous column
    a = depth_values[:, :, None, None].astype(f32) * m0[:, None]  # [B,D,3,3]
    a = a.at[:, :, :, 2].add(trans[:, None, :])
    # n_d solves A_d^T n = e3  ->  source-depth field zs = 1/(n . K^-1 q)
    e3 = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], f32), (b, d, 3))
    n = jnp.linalg.solve(jnp.swapaxes(a, -1, -2), e3[..., None])[..., 0]
    rays = jnp.einsum("bij,jn->bin", k_inv, grid,
                      precision=jax.lax.Precision.HIGHEST)  # [B,3,HW]
    denom = jnp.einsum("bdi,bin->bdn", n, rays,
                       precision=jax.lax.Precision.HIGHEST)  # [B,D,HW]
    zs = 1.0 / denom
    zi = (zs - depth_min) / depth_interval  # [B, D, HW] per SOURCE pixel
    in_front = (denom > 1e-8) & jnp.isfinite(zi)
    zi = jnp.where(in_front, zi, -2.0)

    # hat weights over the Z source planes: 2 nonzero taps per row, hard
    # zero outside [0, Z-1] (the reference's OOB rule, homo_utils.py:192).
    # The validity window is epsilon-padded: the reference's STRICT mask
    # (norm > 1, homo_utils.py:194-198) zeroes a boundary-exact coordinate
    # whenever float noise lands one ulp outside, which pseudo-randomly
    # kills far-plane voxels of every near-identity warp; this mode's zi
    # comes from a different float path than the exact sampler's, so
    # without the epsilon the two modes disagree by FULL voxel values
    # there. 1e-3 plane units is far above the noise, far below a plane.
    valid_z = (zi >= -1e-3) & (zi <= d - 1.0 + 1e-3)
    taps = jnp.arange(d, dtype=f32)
    wz = jnp.maximum(0.0, 1.0 - jnp.abs(zi[..., None] - taps))
    wz = jnp.where(valid_z[..., None], wz, 0.0)  # [B, D, HW, Z]

    src = volume.reshape(b, d, h * w, c)  # z-major rows per source pixel
    mixed = jnp.einsum(
        "bdnz,bznc->bdnc", wz.astype(volume.dtype), src
    )  # [B, D, HW, C]
    mixed = mixed.reshape(b * d, h, w, c)

    # stage B: exact per-voxel (x, y) — one 2D bilinear row gather each
    x2 = x.reshape(b * d, h * w)
    y2 = y.reshape(b * d, h * w)
    out = bilinear_sample_stacked(mixed, x2, y2)
    return out.reshape(b, d, h, w, c)


def frustum_warp(
    volume: jnp.ndarray,
    rel_pose: jnp.ndarray,
    cam_intr: jnp.ndarray,
    depth_values: jnp.ndarray,
    depth_min: float,
    depth_interval: float,
    padding_mode: str = "zeros",
    padding_value: float = 0.0,
    mode: str = "exact",
) -> jnp.ndarray:
    """Resample a source-view frustum volume into the target-view frustum.

    Args:
      volume: [B, D, H, W, C] source K/V cost volume (voxel (d,y,x) sits at
        depth depth_values[:, d] along the source camera ray through (x, y)).
      rel_pose: [B, 4, 4] = src_pose @ inv(target_pose); the inverse is
        applied internally, mirroring warp_volume's cam2cam(.., inverse(pose))
        (homo_utils.py:258) as called from the decoder
        (hybrid_depth_decoder.py:235-243).
      cam_intr: [B, 3, 3] (at the volume's resolution).
      depth_values: [B, D] depth of each plane.
      depth_min / depth_interval: map depth -> fractional plane index
        (homo_utils.py:188).
      mode: "exact" — one trilinear gather per target voxel (bit-faithful
        to the reference's 5D grid_sample, homo_utils.py:276).
        "plane_mix" — the measured-fast TPU reformulation: the per-voxel
        3D gather is the profiled bottleneck of the whole window step
        (~42 ns/row on v5e's gather engine, tools/profile_scan.py), so
        exploit that each TARGET depth plane is a 3D plane: (a) its
        source depth at a source pixel is inverse-affine in that pixel,
        so the z-interpolation becomes a dense [D,Z]x[Z,C] matmul per
        source pixel (MXU work); (b) the plane-to-image map is a
        homography, so what remains is ONE 2D bilinear gather per output
        pixel (the 3x-cheaper 4C-row kind). Exact along each plane
        surface; the z-index is evaluated at the bilinear corner pixels
        instead of the continuous sample point, a sub-plane-spacing
        deviation bounded by the plane's in-image depth slope
        (tests/test_warp.py pins the tolerance). zeros padding only.
        "plane_mix_exact_z" — plane_mix plus a slope-carry correction to
        the EXACT per-voxel z index (second-order residual,
        ops/warp_exact_z.py; tests/test_exact_z_warp.py).
        "plane_mix_pallas" / "plane_mix_pallas_exact_z" — the same two
        fast modes with every gather as a VPU lane gather
        (ops/pallas/plane_warp{,_exact_z}.py).
        "plane_mix_pallas_exact_z_packed" — exact-z on the kernels with
        the (A, s) pair packed as origin-shifted bf16 int32 lanes: plain
        plane-mix kernel cost, ~1e-4-class transport quantization
        (ops/pallas/plane_warp_exact_z.py module doc).

    Returns:
      [B, D, H, W, C] target-frustum volume, trilinear; out-of-range
      samples are 0 for padding_mode="zeros" (the decoder's path), or
      clamp-sampled against a border shell set to `padding_value` for
      padding_mode="border" (warp_volume's optional mode,
      homo_utils.py:271-275 + _set_vol_border).
    """
    b, d, h, w, _ = volume.shape

    grid = geometry.pixel_grid(h, w)  # [3, H*W]
    rays = geometry.backproject(cam_intr, grid)  # [B, 3, H*W]
    # Lift target frustum voxels to 3D: [B, 3, D, H*W]
    pts = rays[:, :, None, :] * depth_values[:, None, :, None]
    t = jnp.linalg.inv(rel_pose)
    pts = geometry.transform_points(t, pts)
    x, y, z = geometry.project_points(cam_intr, pts.reshape(b, 3, -1))

    if mode in ("plane_mix", "plane_mix_exact_z", "plane_mix_pallas",
                "plane_mix_pallas_exact_z",
                "plane_mix_pallas_exact_z_packed") and padding_mode != "zeros":
        raise ValueError(f"{mode} supports zeros padding only")
    if mode == "plane_mix":
        return _frustum_warp_planemix(
            volume, t, cam_intr, depth_values, depth_min, depth_interval,
            grid, x, y,
        )
    if mode == "plane_mix_exact_z":
        # plane_mix plus the slope-carry exact-z correction: the z-lerp
        # index error drops from first to second order (ops/warp_exact_z.py)
        from estdepth_tpu.ops.warp_exact_z import frustum_warp_exact_z

        return frustum_warp_exact_z(
            volume, t, cam_intr, depth_values, depth_min, depth_interval,
            grid, x, y, z,
        )
    if mode == "plane_mix_pallas":
        # plane_mix with every gather on the VPU (lane-gather z-mix +
        # two-pass homography resample, ops/pallas/plane_warp.py)
        from estdepth_tpu.ops.pallas.plane_warp import frustum_warp_pallas

        return frustum_warp_pallas(
            volume, t, cam_intr, depth_values, depth_min, depth_interval,
            grid, x, y,
        )
    if mode in ("plane_mix_pallas_exact_z",
                "plane_mix_pallas_exact_z_packed"):
        # the Pallas two-pass form with the same exact-z correction
        # (ops/pallas/plane_warp_exact_z.py); "_packed" rides the (A, s)
        # pair as origin-shifted bf16 int32 lanes — plain plane-mix
        # kernel cost, ~1e-4-class transport quantization
        from estdepth_tpu.ops.pallas.plane_warp_exact_z import (
            frustum_warp_exact_z_pallas,
        )

        return frustum_warp_exact_z_pallas(
            volume, t, cam_intr, depth_values, depth_min, depth_interval,
            grid, x, y, z, packed=mode.endswith("_packed"),
        )

    zi = (z - depth_min) / depth_interval  # fractional source plane index
    if padding_mode == "border":
        # clamp-to-border sampling = the valid-mask-free clamped gather:
        # pre-clamping the coordinates makes the sampler's validity
        # zeroing a no-op, and the border shell carries padding_value
        out = trilinear_sample_stacked(
            set_volume_border(volume, padding_value),
            jnp.clip(x, 0.0, w - 1.0),
            jnp.clip(y, 0.0, h - 1.0),
            jnp.clip(zi, 0.0, d - 1.0),
        )
    elif padding_mode == "zeros":
        out = trilinear_sample_stacked(volume, x, y, zi)
    else:
        raise ValueError(f"unknown padding_mode: {padding_mode!r}")
    return out.reshape(b, d, h, w, volume.shape[-1])
