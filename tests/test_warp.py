"""Closed-form and torch-golden tests for the two warp ops (SURVEY.md §4)."""

import numpy as np
import pytest

import jax.numpy as jnp

from estdepth_tpu.ops import geometry
from estdepth_tpu.ops.warp import plane_sweep_warp, frustum_warp

torch = pytest.importorskip("torch")


def _intr(b, fx=30.0, fy=30.0, cx=None, cy=None, w=16, h=12):
    cx = (w - 1) / 2 if cx is None else cx
    cy = (h - 1) / 2 if cy is None else cy
    k = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], dtype=np.float32)
    return np.tile(k[None], (b, 1, 1))


def _pose(rng, b, t_scale=0.1):
    """Random small rigid transforms (cam-to-world)."""
    poses = []
    for _ in range(b):
        axis = rng.normal(size=3)
        axis /= np.linalg.norm(axis)
        ang = rng.uniform(-0.1, 0.1)
        K = np.array(
            [
                [0, -axis[2], axis[1]],
                [axis[2], 0, -axis[0]],
                [-axis[1], axis[0], 0],
            ]
        )
        R = np.eye(3) + np.sin(ang) * K + (1 - np.cos(ang)) * (K @ K)
        p = np.eye(4, dtype=np.float32)
        p[:3, :3] = R.astype(np.float32)
        p[:3, 3] = rng.normal(size=3).astype(np.float32) * t_scale
        poses.append(p)
    return np.stack(poses)


def test_plane_sweep_identity_pose(rng):
    """src == ref camera => every depth plane is the unwarped feature map."""
    b, h, w, c, d = 2, 12, 16, 8, 5
    feat = rng.normal(size=(b, h, w, c)).astype(np.float32)
    k = _intr(b, w=w, h=h)
    pose = _pose(rng, b)
    proj = geometry.camera_projection(jnp.array(k), jnp.array(pose))
    depths = jnp.tile(jnp.linspace(1.0, 5.0, d)[None], (b, 1))

    out = np.asarray(plane_sweep_warp(jnp.array(feat), proj, proj, depths))
    # fp32 inverse round-trip noise can push exact-border coords (x == W-1)
    # epsilon out of range, zeroing that pixel — compare interior only.
    for di in range(d):
        np.testing.assert_allclose(
            out[:, di, 1:-1, 1:-1], feat[:, 1:-1, 1:-1], rtol=1e-4, atol=1e-4
        )


def test_plane_sweep_matches_torch_grid_sample(rng):
    """Full parity vs a torch reimplementation of homo_warping's math."""
    b, h, w, c, d = 2, 12, 16, 6, 7
    feat = rng.normal(size=(b, h, w, c)).astype(np.float32)
    k = _intr(b, w=w, h=h)
    ref_pose = _pose(rng, b)
    src_pose = _pose(rng, b, t_scale=0.3)
    ref_proj = np.asarray(
        geometry.camera_projection(jnp.array(k), jnp.array(ref_pose))
    )
    src_proj = np.asarray(
        geometry.camera_projection(jnp.array(k), jnp.array(src_pose))
    )
    depths = np.tile(np.linspace(0.5, 4.0, d, dtype=np.float32)[None], (b, 1))

    got = np.asarray(
        plane_sweep_warp(
            jnp.array(feat), jnp.array(src_proj), jnp.array(ref_proj), jnp.array(depths)
        )
    )

    # torch golden: same math as reference homo_warping (homo_utils.py:458-504)
    proj = np.einsum("bij,bjk->bik", src_proj, np.linalg.inv(ref_proj))
    rot, trans = proj[:, :3, :3], proj[:, :3, 3:4]
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    xyz = np.stack([xx.ravel(), yy.ravel(), np.ones(h * w)]).astype(np.float32)
    rot_xyz = np.einsum("bij,jn->bin", rot, xyz)
    pts = rot_xyz[:, :, None, :] * depths[:, None, :, None] + trans[:, :, None]
    xy = pts[:, :2] / (pts[:, 2:3] + 1e-8)
    gx = xy[:, 0] / ((w - 1) / 2) - 1
    gy = xy[:, 1] / ((h - 1) / 2) - 1
    gx = np.where((gx > 1) | (gx < -1), 2.0, gx)
    gy = np.where((gy > 1) | (gy < -1), 2.0, gy)
    grid = torch.from_numpy(
        np.stack([gx, gy], axis=-1).reshape(b, d * h, w, 2).astype(np.float32)
    )
    t_feat = torch.from_numpy(feat).permute(0, 3, 1, 2)
    want = torch.nn.functional.grid_sample(
        t_feat, grid, mode="bilinear", padding_mode="zeros", align_corners=True
    )
    want = want.reshape(b, c, d, h, w).permute(0, 2, 3, 4, 1).numpy()

    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_frustum_warp_identity(rng):
    """rel_pose == I resamples the volume onto itself (interior exact)."""
    b, d, h, w, c = 1, 6, 10, 14, 4
    vol = rng.normal(size=(b, d, h, w, c)).astype(np.float32)
    k = _intr(b, w=w, h=h)
    eye = np.tile(np.eye(4, dtype=np.float32)[None], (b, 1, 1))
    dmin, dmax = 0.5, 5.0
    interval = (dmax - dmin) / (d - 1)
    depths = jnp.tile(jnp.linspace(dmin, dmax, d)[None], (b, 1))

    out = np.asarray(
        frustum_warp(jnp.array(vol), jnp.array(eye), jnp.array(k), depths, dmin, interval)
    )
    # border planes/rows/cols sit exactly on the valid-range edge; fp32 noise
    # can flip them invalid — compare the interior of the frustum.
    np.testing.assert_allclose(
        out[:, 1:-1, 1:-1, 1:-1], vol[:, 1:-1, 1:-1, 1:-1], rtol=1e-3, atol=1e-3
    )


def test_frustum_warp_matches_torch(rng):
    """Parity vs torch reimplementation of warp_volume (homo_utils.py:240-279)."""
    b, d, h, w, c = 2, 5, 10, 12, 3
    vol = rng.normal(size=(b, d, h, w, c)).astype(np.float32)
    k = _intr(b, w=w, h=h)
    pose_i = _pose(rng, b)
    pose_j = _pose(rng, b, t_scale=0.2)
    rel_pose = np.einsum("bij,bjk->bik", pose_j, np.linalg.inv(pose_i)).astype(
        np.float32
    )
    dmin, dmax = 0.5, 4.0
    interval = (dmax - dmin) / (d - 1)
    depths = np.tile(np.linspace(dmin, dmax, d, dtype=np.float32)[None], (b, 1))

    got = np.asarray(
        frustum_warp(
            jnp.array(vol), jnp.array(rel_pose), jnp.array(k), jnp.array(depths),
            dmin, interval,
        )
    )

    # torch golden replicating warp_volume's pipeline
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    pix = np.stack([xx.ravel(), yy.ravel(), np.ones(h * w)]).astype(np.float32)
    kinv = np.linalg.inv(k)
    rays = np.einsum("bij,jn->bin", kinv, pix)  # [b,3,HW]
    cam = rays[:, :, None, :] * depths[:, None, :, None]  # [b,3,D,HW]
    t = np.linalg.inv(rel_pose)
    cam2 = np.einsum("bij,bjdn->bidn", t[:, :3, :3], cam) + t[:, :3, 3][:, :, None, None]
    uvw = np.einsum("bij,bjdn->bidn", k, cam2)
    z = uvw[:, 2]
    x = uvw[:, 0] / (z + 1e-10)
    y = uvw[:, 1] / (z + 1e-10)
    gx = 2 * x / (w - 1) - 1
    gy = 2 * y / (h - 1) - 1
    gz = 2 * ((z - dmin) / interval) / (d - 1) - 1
    bad = lambda g: (g > 1) | (g < -1)
    mx, my, mz = bad(gx), bad(gy), bad(gz)
    gx = np.where(mx, 2.0, gx)
    gy = np.where(my, 2.0, gy)
    gz = np.where(mz, 2.0, gz)
    grid = torch.from_numpy(
        np.stack([gx, gy, gz], axis=-1).reshape(b, d, h, w, 3).astype(np.float32)
    )
    t_vol = torch.from_numpy(vol).permute(0, 4, 1, 2, 3)
    want = torch.nn.functional.grid_sample(
        t_vol, grid, mode="bilinear", padding_mode="zeros", align_corners=True
    )
    want = want.permute(0, 2, 3, 4, 1).numpy()

    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_synthetic_plane_exact_depth(rng):
    """A fronto-parallel textured plane at a hypothesis depth warps exactly.

    If the scene is a plane at depth depth_k and we warp the source feature
    with the homography for depth_k, the warped map must equal the reference
    view's feature map (perfect photo-consistency at the true depth).
    """
    b, h, w, c = 1, 24, 32, 4
    k = _intr(b, fx=40.0, fy=40.0, w=w, h=h)
    true_depth = 2.0

    # source camera translated along x
    ref_pose = np.tile(np.eye(4, dtype=np.float32)[None], (b, 1, 1))
    src_pose = ref_pose.copy()
    src_pose[:, 0, 3] = 0.15

    # render a smooth texture on the plane z=true_depth seen from each camera
    def render(pose):
        kinv = np.linalg.inv(k[0])
        yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        pix = np.stack([xx.ravel(), yy.ravel(), np.ones(h * w)]).astype(np.float32)
        rays = kinv @ pix  # cam dirs at unit depth
        # intersect with world plane z = true_depth: world = R*ray*t + c
        R, cpos = pose[0, :3, :3], pose[0, :3, 3]
        dirs = R @ rays
        tt = (true_depth - cpos[2]) / dirs[2]
        world = dirs * tt + cpos[:, None]  # [3, HW]
        feats = np.stack(
            [np.sin(world[0] * (i + 1)) + np.cos(world[1] * (i + 2)) for i in range(c)],
            axis=-1,
        ).astype(np.float32)
        return feats.reshape(1, h, w, c)

    ref_feat = render(ref_pose)
    src_feat = render(src_pose)

    proj_r = geometry.camera_projection(jnp.array(k), jnp.array(ref_pose))
    proj_s = geometry.camera_projection(jnp.array(k), jnp.array(src_pose))
    depths = jnp.array([[1.0, true_depth, 4.0]], dtype=jnp.float32)
    out = np.asarray(plane_sweep_warp(jnp.array(src_feat), proj_s, proj_r, depths))

    # at the true-depth plane the warp must reproduce the ref view (where valid)
    warped = out[0, 1]
    valid = np.abs(warped).sum(-1) > 0
    assert valid.mean() > 0.5
    err = np.abs(warped - ref_feat[0])[valid]
    assert err.max() < 5e-2  # bilinear resampling error on a smooth texture
