"""Lane-packed conv3d (ops/packed_conv.py): exactness vs the plain conv,
and full-model equivalence of DepthNetHybrid(lane_pack=True).

The packed form must be bit-equivalent up to float summation order — the
banded zero taps contribute exact zeros — and the parameter tree must be
IDENTICAL (checkpoints, the torch converter, and every parity harness see
no difference)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from estdepth_tpu.models import DepthNetHybrid, ESTMemory
from estdepth_tpu.ops.packed_conv import (
    choose_pack, lane_packed_conv3d, pack_kernel3d,
)
from estdepth_tpu.data.synthetic import SyntheticSceneConfig, synthetic_stream


@pytest.mark.parametrize(
    "shape,k,co,p",
    [
        ((1, 6, 8, 16, 5), (3, 3, 3), 7, 4),
        ((2, 4, 6, 24, 33), (3, 3, 3), 16, 8),
        ((1, 5, 7, 16, 64), (1, 1, 1), 32, 4),
        ((1, 4, 6, 16, 16), (3, 3, 3), 1, 16),
        ((1, 4, 6, 20, 8), (3, 3, 3), 4, 5),  # non-power-of-two pack
    ],
)
def test_packed_equals_plain(shape, k, co, p):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    w = jnp.asarray(rng.normal(size=k + (shape[-1], co)).astype(np.float32))
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1, 1),
        [(k[0] // 2,) * 2, (k[1] // 2,) * 2, (k[2] // 2,) * 2],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    got = lane_packed_conv3d(x, w, p)
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)
    # bias path
    b = jnp.asarray(rng.normal(size=(co,)).astype(np.float32))
    np.testing.assert_allclose(
        lane_packed_conv3d(x, w, p, b), ref + b, rtol=2e-5, atol=2e-5
    )


def test_packed_kernel_band_structure():
    w = jnp.asarray(
        np.random.default_rng(1).normal(size=(3, 3, 3, 4, 6)
                                        ).astype(np.float32)
    )
    pk = pack_kernel3d(w, 4).reshape(3, 3, 6, 4, 4, 6)
    for dx in range(4):
        np.testing.assert_array_equal(pk[:, :, dx : dx + 3, :, dx, :], w)
        # off-band taps are exactly zero
        assert float(jnp.abs(pk[:, :, :dx, :, dx, :]).sum()) == 0.0
        assert float(jnp.abs(pk[:, :, dx + 3 :, :, dx, :]).sum()) == 0.0


def test_choose_pack():
    assert choose_pack(32, 80) == 4
    assert choose_pack(16, 80) == 8
    assert choose_pack(33, 80) == 2
    assert choose_pack(1, 80) == 16
    assert choose_pack(16, 24) == 8
    assert choose_pack(32, 25) == 1  # no divisor -> plain conv
    assert choose_pack(128, 80) == 1


def test_packed_gradients_match():
    """The packed conv's vjp (strided-conv backward through the banded
    kernel build) must match the plain conv's."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 4, 6, 16, 8)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 8, 16)).astype(np.float32))

    def loss(fn):
        def f(x_, w_):
            y = fn(x_, w_)
            return jnp.sum(jnp.sin(y))
        return jax.grad(f, argnums=(0, 1))

    gx_ref, gw_ref = loss(lambda a, b: lane_packed_conv3d(a, b, 1))(x, w)
    gx, gw = loss(lambda a, b: lane_packed_conv3d(a, b, 8))(x, w)
    # tolerance: the strided-conv backward contracts in a different order
    # than the plain conv's (f32 reassociation noise only)
    np.testing.assert_allclose(gx, gx_ref, rtol=5e-3, atol=5e-4)
    np.testing.assert_allclose(gw, gw_ref, rtol=5e-3, atol=5e-4)


def test_model_lane_pack_equivalence():
    """DepthNetHybrid(lane_pack=True): identical parameter tree and
    matching outputs on the full ESTM streaming path."""
    h, w, nd = 64, 96, 8
    kw = dict(
        ndepths=nd, depth_min=0.5, depth_max=8.0, resnet=18,
        est_transformer=True,
    )
    plain = DepthNetHybrid(**kw)
    packed = DepthNetHybrid(lane_pack=True, **kw)

    frames = list(
        synthetic_stream(
            SyntheticSceneConfig(height=h, width=w), n_frames=3,
            depth_min=0.5, depth_max=8.0,
        )
    )
    imgs = jnp.asarray(
        np.stack([f["img"] for f in frames])[None].astype(np.float32)
    )
    poses = jnp.asarray(
        np.stack([f["cam_pose"] for f in frames])[None].astype(np.float32)
    )
    intr = jnp.asarray(frames[0]["cam_intr"][None].astype(np.float32))
    memory = ESTMemory.create(1, 2, nd, h // 4, w // 4, 16)
    memory = memory.replace(
        keys=jax.random.normal(jax.random.key(1), memory.keys.shape),
        values=jax.random.normal(jax.random.key(2), memory.values.shape),
        poses=jnp.tile(jnp.eye(4)[None, None], (1, 2, 1, 1)),
        valid=jnp.ones_like(memory.valid),
    )

    variables = jax.jit(
        lambda r: plain.init(r, imgs, poses, intr, train=False)
    )(jax.random.key(0))
    # identical parameter trees: the packed model loads the plain init
    out_a, st_a = jax.jit(
        lambda v: plain.apply(v, imgs, poses, intr, memory=memory,
                              use_est=True, train=False)
    )(variables)
    out_b, st_b = jax.jit(
        lambda v: packed.apply(v, imgs, poses, intr, memory=memory,
                               use_est=True, train=False)
    )(variables)
    np.testing.assert_allclose(
        out_a["depth"], out_b["depth"], rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(st_a[0], st_b[0], rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(st_a[1], st_b[1], rtol=2e-4, atol=2e-4)
