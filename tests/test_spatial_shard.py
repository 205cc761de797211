"""Width-sharded multi-chip inference == single-device inference.

Beyond-reference latency parallelism (parallel/spatial.py): the full
DepthNetHybrid forward partitioned over an 8-virtual-device mesh along the
image width, numerics checked against the unsharded run.
"""

import numpy as np

import jax
import jax.numpy as jnp

from estdepth_tpu.data.synthetic import SyntheticSceneConfig, synthetic_stream
from estdepth_tpu.models import DepthNetHybrid, ESTMemory
from estdepth_tpu.parallel.mesh import create_mesh
from estdepth_tpu.parallel.spatial import make_spatial_window_fn

import pytest

# full forward width-sharded over 8 devices
pytestmark = pytest.mark.slow


def _setup():
    h, w, nd = 64, 96, 8
    model = DepthNetHybrid(
        ndepths=nd, depth_min=0.5, depth_max=8.0, resnet=18,
        est_transformer=True,
    )
    cfg = SyntheticSceneConfig(height=h, width=w, focal=80.0)
    frames = list(
        synthetic_stream(cfg, n_frames=3, depth_min=0.5, depth_max=8.0)
    )
    imgs = jnp.asarray(np.stack([f["img"] for f in frames])[None])
    poses = jnp.asarray(np.stack([f["cam_pose"] for f in frames])[None])
    intr = jnp.asarray(frames[0]["cam_intr"][None])
    variables = jax.jit(
        lambda r, i, p, k: model.init(r, i, p, k, train=False)
    )(jax.random.key(0), imgs, poses, intr)
    return model, variables, imgs, poses, intr, nd, h, w


def test_spatial_sharded_matches_single_device():
    model, variables, imgs, poses, intr, nd, h, w = _setup()
    want, _ = model.apply(variables, imgs, poses, intr, use_est=False,
                          train=False)

    mesh = create_mesh(8)
    fn = make_spatial_window_fn(model, mesh)
    got, _ = fn(variables, imgs, poses, intr)
    # partitioned reductions (GroupNorm psum across shards, softargmin)
    # reorder fp32 sums; ~0.3% relative on depth is the expected noise
    np.testing.assert_allclose(
        np.asarray(got["depth"]), np.asarray(want["depth"]),
        rtol=1e-2, atol=2e-2,
    )


def test_spatial_sharded_with_memory_matches():
    model, variables, imgs, poses, intr, nd, h, w = _setup()
    rng = np.random.default_rng(0)
    mem = ESTMemory.create(1, 2, nd, h // 4, w // 4, 16)
    mem = mem.replace(
        keys=jnp.asarray(rng.normal(size=mem.keys.shape).astype(np.float32)),
        values=jnp.asarray(
            np.tanh(rng.normal(size=mem.values.shape)).astype(np.float32)
        ),
        poses=jnp.tile(poses[:, :1], (1, 2, 1, 1)),
        valid=jnp.ones_like(mem.valid),
    )
    want, _ = model.apply(variables, imgs, poses, intr, memory=mem,
                          use_est=True, train=False)

    mesh = create_mesh(8)
    fn = make_spatial_window_fn(model, mesh, with_memory=True)
    got, _ = fn(variables, imgs, poses, intr, mem)
    np.testing.assert_allclose(
        np.asarray(got["depth"]), np.asarray(want["depth"]),
        rtol=1e-2, atol=2e-2,
    )
