"""Pure-jnp camera geometry.

TPU-native replacement for the reference's torch geometry helpers
(/root/reference/utils/homo_utils.py:7-134). Everything here is a pure
function on arrays with static shapes, fp32 coordinate math, and no
data-dependent control flow — safe under jit/vmap/shard_map.

Conventions:
  * camera poses are cam-to-world [.., 4, 4]
  * intrinsics K are [.., 3, 3]
  * pixel coordinate (x, y) has x along width, y along height, origin at
    the corner pixel center (align_corners=True convention, matching the
    torch-1.2 grid_sample semantics the reference relies on).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Coordinate math must be exact fp32: TPU default matmul precision is bf16,
# which corrupts projective transforms (pixel-scale errors).
_P = jax.lax.Precision.HIGHEST


def pixel_grid(height: int, width: int, dtype=jnp.float32) -> jnp.ndarray:
    """Homogeneous pixel coordinate grid [3, H*W] with rows (x, y, 1).

    Mirrors set_id_grid (homo_utils.py:7-14) / the meshgrid in homo_warping
    (homo_utils.py:473-477), flattened row-major over (y, x).
    """
    y = jnp.arange(height, dtype=dtype)
    x = jnp.arange(width, dtype=dtype)
    yy, xx = jnp.meshgrid(y, x, indexing="ij")
    ones = jnp.ones_like(xx)
    return jnp.stack([xx.reshape(-1), yy.reshape(-1), ones.reshape(-1)], axis=0)


def scale_intrinsics(cam_intr: jnp.ndarray, scale: float) -> jnp.ndarray:
    """Scale the first two rows of K (reference model_hybrid.py:104-108)."""
    row_scale = jnp.array([scale, scale, 1.0], dtype=cam_intr.dtype)
    return cam_intr * row_scale[..., :, None]


def intrinsics_4x4(cam_intr: jnp.ndarray) -> jnp.ndarray:
    """Embed K [B,3,3] into a 4x4 projection-friendly matrix [B,4,4]."""
    b = cam_intr.shape[0]
    out = jnp.tile(jnp.eye(4, dtype=cam_intr.dtype)[None], (b, 1, 1))
    return out.at[:, :3, :3].set(cam_intr)


def camera_projection(cam_intr: jnp.ndarray, cam_pose: jnp.ndarray) -> jnp.ndarray:
    """World->pixel projection matrix: rows [K @ E[:3,:4]; 0 0 0 1].

    E = inverse(pose) is the extrinsic. Mirrors the src_proj_new/ref_proj_new
    construction in get_costvolume (model_hybrid.py:85-88).
    """
    extr = jnp.linalg.inv(cam_pose)
    top = jnp.einsum("bij,bjk->bik", cam_intr, extr[:, :3, :4], precision=_P)
    bottom = extr[:, 3:4, :4]
    return jnp.concatenate([top, bottom], axis=1)


def relative_projection(src_proj: jnp.ndarray, ref_proj: jnp.ndarray):
    """rot [B,3,3], trans [B,3] of src_proj @ inv(ref_proj).

    Mirrors homo_warping's proj decomposition (homo_utils.py:469-471).
    """
    proj = jnp.einsum(
        "bij,bjk->bik", src_proj, jnp.linalg.inv(ref_proj), precision=_P
    )
    return proj[:, :3, :3], proj[:, :3, 3]


def backproject(cam_intr: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """Unit-depth camera rays K^-1 @ grid: [B, 3, N].

    Mirrors pixel2cam (homo_utils.py:40-62) before the depth multiply.
    grid is [3, N] (shared across batch).
    """
    k_inv = jnp.linalg.inv(cam_intr)
    return jnp.einsum("bij,jn->bin", k_inv, grid, precision=_P)


def transform_points(mat4: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply a [B,4,4] rigid transform to [B, 3, ...] points (homogeneous).

    Mirrors cam2cam (homo_utils.py:26-37) without materializing the ones row.
    """
    rot = mat4[:, :3, :3]
    trans = mat4[:, :3, 3]
    b = pts.shape[0]
    flat = pts.reshape(b, 3, -1)
    out = jnp.einsum("bij,bjn->bin", rot, flat, precision=_P) + trans[:, :, None]
    return out.reshape(pts.shape)


def project_points(cam_intr: jnp.ndarray, pts: jnp.ndarray, eps: float = 1e-10):
    """Project [B, 3, N] camera points to pixels; returns (x, y, z) each [B, N].

    Mirrors cam2pixel_depth (homo_utils.py:107-134) incl. its 1e-10 epsilon.
    """
    uvw = jnp.einsum("bij,bjn->bin", cam_intr, pts, precision=_P)
    z = uvw[:, 2]
    x = uvw[:, 0] / (z + eps)
    y = uvw[:, 1] / (z + eps)
    return x, y, z
