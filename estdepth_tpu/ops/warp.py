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


def frustum_warp(
    volume: jnp.ndarray,
    rel_pose: jnp.ndarray,
    cam_intr: jnp.ndarray,
    depth_values: jnp.ndarray,
    depth_min: float,
    depth_interval: float,
    padding_mode: str = "zeros",
    padding_value: float = 0.0,
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
