"""frustum_warp(mode="plane_mix") accuracy vs the exact trilinear warp.

plane_mix is a measured-fast reformulation (dense z-mix matmul + per-plane
2D homography gather, ops/warp.py) whose only deviation is evaluating the
z-interpolation index at the bilinear corner pixels instead of the
continuous sample point — bounded by the plane's in-image depth slope per
pixel (sub-plane-spacing for realistic camera motion). These tests pin:
  * near-equality on realistic inter-frame motions (volume level);
  * exactness for pure in-plane motions (depth slope zero);
  * end-to-end: the model's depth maps with fast_frustum=True stay within
    a small tolerance of the exact model's on a synthetic scene.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from estdepth_tpu.data.synthetic import SyntheticSceneConfig, synthetic_stream
from estdepth_tpu.models import DepthNetHybrid, ESTMemory
from estdepth_tpu.ops.se3 import exp_map
from estdepth_tpu.ops.warp import frustum_warp


def _smooth_volume(rng, b, d, h, w, c):
    """Band-limited volume: white noise would make any interpolation-order
    difference look large; cost volumes are smooth in practice."""
    coarse = rng.normal(size=(b, max(d // 4, 1), max(h // 4, 1),
                              max(w // 4, 1), c)).astype(np.float32)
    v = jnp.asarray(coarse)
    v = jax.image.resize(v, (b, d, h, w, c), method="trilinear")
    return v


def _intr(h, w, f=60.0):
    return jnp.asarray(
        [[[f, 0.0, (w - 1) / 2], [0.0, f, (h - 1) / 2], [0.0, 0.0, 1.0]]],
        jnp.float32,
    )


DMIN, DMAX, ND = 0.5, 8.0, 16
DINT = (DMAX - DMIN) / (ND - 1)


def _warp_pair(vol, rel, intr, dv):
    exact = frustum_warp(vol, rel, intr, dv, DMIN, DINT, mode="exact")
    fast = frustum_warp(vol, rel, intr, dv, DMIN, DINT, mode="plane_mix")
    return np.asarray(exact), np.asarray(fast)


@pytest.mark.parametrize(
    "tvec,rot",
    [
        ((0.05, 0.02, 0.01), (0.01, -0.02, 0.005)),   # typical inter-frame
        ((0.15, -0.05, 0.08), (0.03, 0.02, -0.01)),   # larger motion
    ],
)
def test_planemix_close_on_realistic_motion(tvec, rot):
    rng = np.random.default_rng(0)
    b, h, w, c = 1, 24, 32, 8
    vol = _smooth_volume(rng, b, ND, h, w, c)
    rel = exp_map(jnp.asarray([rot + tvec], jnp.float32))
    dv = jnp.tile(
        (jnp.arange(ND, dtype=jnp.float32) * DINT + DMIN)[None], (b, 1)
    )
    exact, fast = _warp_pair(vol, rel, _intr(h, w), dv)
    scale = np.abs(exact).max()
    # interior agreement: the deviation lives in the z-lerp weight, which
    # moves by at most the in-image depth slope per sub-pixel offset
    diff = np.abs(fast - exact)
    assert np.median(diff) <= 2e-3 * scale
    assert np.mean(diff) <= 2e-2 * scale
    # and the two must be strongly correlated overall (no structural error)
    corr = np.corrcoef(exact.ravel(), fast.ravel())[0, 1]
    assert corr > 0.995, corr


def test_planemix_exact_for_inplane_motion():
    """Pure in-plane translation (no z component, no rotation): every
    target plane keeps a CONSTANT source depth, the depth slope is zero,
    and plane_mix must agree with the exact warp to float tolerance."""
    rng = np.random.default_rng(1)
    b, h, w, c = 1, 16, 24, 4
    vol = _smooth_volume(rng, b, ND, h, w, c)
    rel = jnp.tile(jnp.eye(4, dtype=jnp.float32)[None], (b, 1, 1))
    rel = rel.at[:, 0, 3].set(0.12).at[:, 1, 3].set(-0.07)
    dv = jnp.tile(
        (jnp.arange(ND, dtype=jnp.float32) * DINT + DMIN)[None], (b, 1)
    )
    exact, fast = _warp_pair(vol, rel, _intr(h, w), dv)
    np.testing.assert_allclose(fast, exact, atol=2e-3, rtol=1e-3)


def test_model_fast_frustum_end_to_end():
    """DepthNetHybrid(fast_frustum=True) depth maps stay close to the
    exact model's on a streaming window with a filled memory."""
    h, w, nd = 64, 96, 8
    kw = dict(ndepths=nd, depth_min=0.5, depth_max=8.0, resnet=18,
              est_transformer=True)
    exact_m = DepthNetHybrid(**kw)
    fast_m = DepthNetHybrid(fast_frustum=True, **kw)

    frames = list(synthetic_stream(
        SyntheticSceneConfig(height=h, width=w), n_frames=5,
        depth_min=0.5, depth_max=8.0,
    ))
    imgs = jnp.asarray(np.stack(
        [f["img"] for f in frames[:3]])[None].astype(np.float32))
    poses = jnp.asarray(np.stack(
        [f["cam_pose"] for f in frames[:3]])[None].astype(np.float32))
    intr = jnp.asarray(frames[0]["cam_intr"][None].astype(np.float32))

    variables = jax.jit(
        lambda r: exact_m.init(r, imgs, poses, intr, train=False)
    )(jax.random.key(0))

    # a filled memory from real decoder state: run the exact model once
    out0, (k0, v0, p0) = jax.jit(
        lambda v: exact_m.apply(v, imgs, poses, intr, train=False,
                                use_est=False)
    )(variables)
    memory = ESTMemory.create(1, 2, nd, h // 4, w // 4, 16)
    memory = memory.push(k0, v0, p0).push(k0, v0, jnp.asarray(
        np.stack([frames[2]["cam_pose"]])[None])[:, 0])

    imgs2 = jnp.asarray(np.stack(
        [f["img"] for f in frames[2:5]])[None].astype(np.float32))
    poses2 = jnp.asarray(np.stack(
        [f["cam_pose"] for f in frames[2:5]])[None].astype(np.float32))

    d_exact = jax.jit(lambda v: exact_m.apply(
        v, imgs2, poses2, intr, memory=memory, use_est=True, train=False
    )[0]["depth"])(variables)
    d_fast = jax.jit(lambda v: fast_m.apply(
        v, imgs2, poses2, intr, memory=memory, use_est=True, train=False
    )[0]["depth"])(variables)

    d_exact, d_fast = np.asarray(d_exact), np.asarray(d_fast)
    # absolute depth agreement (depth range 0.5..8.0 here)
    assert np.abs(d_fast - d_exact).mean() < 0.02
    assert np.abs(d_fast - d_exact).max() < 0.5
