"""SE(3) Lie-group helpers and rotation conversions.

Behavioral equivalents of the reference's pose math
(/root/reference/utils/homo_utils.py:322-455): skew, exponential and
logarithmic maps between se(3) twists and 4x4 rigid transforms, rotation
matrix -> euler, quaternion -> rotation matrix. Pure jnp (batched) except
the two numpy conversion helpers, mirroring the reference split.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _einsum(spec, *args):
    # pose algebra must be fp32-exact on TPU (CLAUDE.md: the default bf16
    # matmul precision drifts coordinates by ~1/128)
    return jnp.einsum(*((spec,) + args), precision=jax.lax.Precision.HIGHEST)


def skew(phi: jnp.ndarray) -> jnp.ndarray:
    """[B, 3] -> [B, 3, 3] cross-product matrices (homo_utils.py:322-334)."""
    zeros = jnp.zeros_like(phi[:, 0])
    rows = [
        jnp.stack([zeros, -phi[:, 2], phi[:, 1]], axis=-1),
        jnp.stack([phi[:, 2], zeros, -phi[:, 0]], axis=-1),
        jnp.stack([-phi[:, 1], phi[:, 0], zeros], axis=-1),
    ]
    return jnp.stack(rows, axis=1)


def exp_map(ksai: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """se(3) twist [B, 6] (omega, upsilon) -> SE(3) [B, 4, 4]
    (homo_utils.py:337-365), with a small-angle guard the reference lacks."""
    b = ksai.shape[0]
    omega, upsilon = ksai[:, :3], ksai[:, 3:]
    theta = jnp.linalg.norm(omega, axis=-1, keepdims=True)  # [B,1]
    theta = jnp.maximum(theta, eps)[:, :, None]  # [B,1,1]

    om = skew(omega)
    om2 = _einsum("bij,bjk->bik", om, om)
    eye = jnp.tile(jnp.eye(3, dtype=ksai.dtype)[None], (b, 1, 1))

    sin_t, cos_t = jnp.sin(theta), jnp.cos(theta)
    rot = eye + sin_t * om / theta + (1 - cos_t) * om2 / (theta**2)
    v = (
        eye
        + (1 - cos_t) * om / (theta**2)
        + (theta - sin_t) * om2 / (theta**3)
    )
    t = _einsum("bij,bj->bi", v, upsilon)

    top = jnp.concatenate([rot, t[:, :, None]], axis=-1)
    bottom = jnp.tile(
        jnp.array([[0.0, 0.0, 0.0, 1.0]], ksai.dtype)[None], (b, 1, 1)
    )
    return jnp.concatenate([top, bottom], axis=1)


def log_map(se3: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """SE(3) [B, 4, 4] -> twist [B, 6] (omega, upsilon)
    (homo_utils.py:368-400)."""
    b = se3.shape[0]
    r = se3[:, :3, :3]
    t = se3[:, :3, 3]
    d = 0.5 * (r[:, 0, 0] + r[:, 1, 1] + r[:, 2, 2] - 1.0)
    d = jnp.clip(d, -1.0 + eps, 1.0 - eps)[:, None]
    dr = jnp.stack(
        [
            r[:, 2, 1] - r[:, 1, 2],
            r[:, 0, 2] - r[:, 2, 0],
            r[:, 1, 0] - r[:, 0, 1],
        ],
        axis=-1,
    )
    theta = jnp.arccos(d)
    omega = theta * dr / (2.0 * jnp.sqrt(1.0 - d * d))
    om = skew(omega)
    om2 = _einsum("bij,bjk->bik", om, om)
    eye = jnp.tile(jnp.eye(3, dtype=se3.dtype)[None], (b, 1, 1))
    th = jnp.maximum(theta, eps)[:, :, None]
    v_inv = (
        eye
        - 0.5 * om
        + (1.0 - th / (2.0 * jnp.tan(th / 2.0))) * om2 / (th**2)
    )
    upsilon = _einsum("bij,bj->bi", v_inv, t)
    return jnp.concatenate([omega, upsilon], axis=-1)


def mat2euler_np(rot: np.ndarray) -> np.ndarray:
    """Rotation matrix -> euler XYZ, numpy (homo_utils.py:403-426)."""
    r11, r12, r13 = rot[0][0], rot[0][1], rot[0][2]
    r23, r33 = rot[1][2], rot[2][2]
    rx = np.arctan2(-r23, r33)
    ry = np.arctan2(r13, np.sqrt(r11 * r11 + r12 * r12))
    rz = np.arctan2(-r12, r11)
    return np.stack([rx, ry, rz])


def quat2mat_np(q) -> np.ndarray:
    """(w, x, y, z) quaternion -> 3x3 rotation, numpy
    (homo_utils.py:429-455)."""
    w, x, y, z = q
    nq = w * w + x * x + y * y + z * z
    if nq < 1e-8:
        return np.eye(3)
    s = 2.0 / nq
    xs, ys, zs = x * s, y * s, z * s
    wx, wy, wz = w * xs, w * ys, w * zs
    xx, xy, xz = x * xs, x * ys, x * zs
    yy, yz, zz = y * ys, y * zs, z * zs
    return np.array(
        [
            [1.0 - (yy + zz), xy - wz, xz + wy],
            [xy + wz, 1.0 - (xx + zz), yz - wx],
            [xz - wy, yz + wx, 1.0 - (xx + yy)],
        ]
    )
