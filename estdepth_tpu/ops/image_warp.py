"""Image-space warps built on the samplers.

Behavioral equivalents of inverse_warp and warp_depth
(/root/reference/utils/homo_utils.py:208-237, 282-302) — not on the main
model path (SURVEY.md §2.1) but part of the geometry API surface.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from estdepth_tpu.ops import geometry
from estdepth_tpu.ops.sampling import bilinear_sample


def inverse_warp(
    feat: jnp.ndarray,       # [B, H, W, C] source features
    depth: jnp.ndarray,      # [B, H, W] target depth
    pose: jnp.ndarray,       # [B, 4, 4] source-to-target cam-to-world
    cam_intr: jnp.ndarray,   # [B, 3, 3]
) -> jnp.ndarray:
    """Sample source features at the target pixels' reprojections
    (homo_utils.py:208-237): lift target pixels by depth, move into the
    source frame with inverse(pose), project, bilinear sample."""
    b, h, w = depth.shape
    grid = geometry.pixel_grid(h, w)
    rays = geometry.backproject(cam_intr, grid)  # [B,3,HW]
    pts = rays * depth.reshape(b, 1, -1)
    pts = geometry.transform_points(jnp.linalg.inv(pose), pts)
    x, y, _ = geometry.project_points(cam_intr, pts)
    out = bilinear_sample(feat, x, y)
    return out.reshape(b, h, w, feat.shape[-1])


def warp_depth(
    depth: jnp.ndarray,      # [B, H, W] reference depth
    rel_pose: jnp.ndarray,   # [B, 4, 4] src_pose @ inv(ref_pose)
    cam_intr: jnp.ndarray,   # [B, 3, 3]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Depth of reference pixels expressed in the source camera
    (homo_utils.py:282-302). Returns (warped_depth [B,H,W], valid [B,H,W])."""
    b, h, w = depth.shape
    grid = geometry.pixel_grid(h, w)
    rays = geometry.backproject(cam_intr, grid)
    pts = rays * depth.reshape(b, 1, -1)
    pts = geometry.transform_points(jnp.linalg.inv(rel_pose), pts)
    x, y, z = geometry.project_points(cam_intr, pts)
    valid = (x >= 0) & (x <= w - 1) & (y >= 0) & (y <= h - 1)
    return z.reshape(b, h, w), valid.reshape(b, h, w)
