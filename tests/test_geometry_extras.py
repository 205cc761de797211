"""SE(3), image-space warps, point-cloud extras."""

import numpy as np

import jax.numpy as jnp

from estdepth_tpu.ops.se3 import exp_map, log_map, mat2euler_np, quat2mat_np, skew
from estdepth_tpu.ops.image_warp import inverse_warp, warp_depth
from estdepth_tpu.utils.pointcloud import (
    backproject_depth,
    fill_depth_nearest,
    write_ply,
)


def test_skew_cross_product(rng):
    a = rng.normal(size=(4, 3)).astype(np.float32)
    b = rng.normal(size=(4, 3)).astype(np.float32)
    got = np.einsum("bij,bj->bi", np.asarray(skew(jnp.array(a))), b)
    want = np.cross(a, b)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_exp_log_roundtrip(rng):
    ksai = (0.3 * rng.normal(size=(6, 6))).astype(np.float32)
    se3 = np.asarray(exp_map(jnp.array(ksai)))
    # valid rigid transforms
    rot = se3[:, :3, :3]
    np.testing.assert_allclose(
        np.einsum("bij,bkj->bik", rot, rot),
        np.tile(np.eye(3)[None], (6, 1, 1)),
        atol=1e-5,
    )
    back = np.asarray(log_map(jnp.array(se3)))
    np.testing.assert_allclose(back, ksai, atol=1e-4)


def test_quat_euler_consistency():
    # 90-degree yaw quaternion
    q = (np.cos(np.pi / 4), 0.0, np.sin(np.pi / 4), 0.0)
    rot = quat2mat_np(q)
    np.testing.assert_allclose(rot @ rot.T, np.eye(3), atol=1e-12)
    euler = mat2euler_np(rot)
    np.testing.assert_allclose(euler[1], np.pi / 2, atol=1e-6)


def test_inverse_warp_identity(rng):
    b, h, w, c = 1, 10, 12, 3
    feat = rng.normal(size=(b, h, w, c)).astype(np.float32)
    depth = np.full((b, h, w), 2.0, np.float32)
    pose = np.tile(np.eye(4, dtype=np.float32)[None], (b, 1, 1))
    k = np.array([[[20.0, 0, 5.5], [0, 20.0, 4.5], [0, 0, 1]]], np.float32)
    out = np.asarray(
        inverse_warp(jnp.array(feat), jnp.array(depth), jnp.array(pose),
                     jnp.array(k))
    )
    np.testing.assert_allclose(
        out[:, 1:-1, 1:-1], feat[:, 1:-1, 1:-1], atol=1e-4
    )


def test_warp_depth_translation():
    """Pure z-translation: warp_depth applies inv(rel_pose) to ref-cam
    points (homo_utils.py:296), so rel tz=-0.5 adds +0.5 depth."""
    b, h, w = 1, 8, 10
    depth = np.full((b, h, w), 3.0, np.float32)
    rel = np.tile(np.eye(4, dtype=np.float32)[None], (b, 1, 1))
    rel[:, 2, 3] = -0.5
    k = np.array([[[20.0, 0, 4.5], [0, 20.0, 3.5], [0, 0, 1]]], np.float32)
    z, valid = warp_depth(jnp.array(depth), jnp.array(rel), jnp.array(k))
    z = np.asarray(z)
    assert np.allclose(z, 3.5, atol=1e-5)


def test_pointcloud_roundtrip(tmp_path, rng):
    depth = rng.uniform(1, 3, size=(6, 8)).astype(np.float32)
    k = np.array([[10.0, 0, 3.5], [0, 10.0, 2.5], [0, 0, 1]])
    pts = backproject_depth(depth, k)
    assert pts.shape == (48, 3)
    np.testing.assert_allclose(pts[:, 2], depth.ravel(), rtol=1e-6)
    path = str(tmp_path / "cloud.ply")
    write_ply(path, pts, np.zeros((48, 3), np.uint8))
    text = open(path).read()
    assert "element vertex 48" in text


def test_fill_depth_nearest():
    d = np.array([[1.0, 0.0, 2.0], [0.0, 0.0, 0.0], [3.0, 0.0, 4.0]])
    filled = fill_depth_nearest(d)
    assert (filled > 0).all()
    # original values untouched
    assert filled[0, 0] == 1.0 and filled[2, 2] == 4.0
