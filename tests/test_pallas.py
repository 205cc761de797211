"""Pallas kernel numerical equivalence vs jnp references (interpret mode on
CPU; the same kernels compile natively on TPU)."""

import numpy as np

import jax.numpy as jnp

from estdepth_tpu.ops.pallas.epipolar_attention import (
    epipolar_attention,
    epipolar_attention_reference,
)


def _case(rng, n=4, s=6, p=256, c=16, none_valid_row=None):
    tk = rng.normal(size=(s, p, c)).astype(np.float32)
    wk = rng.normal(size=(n, s, p, c)).astype(np.float32)
    wv = rng.normal(size=(n, s, p, c)).astype(np.float32)
    valid = rng.uniform(size=(n, s)) > 0.3
    valid[:, 0] = True  # at least one fully-valid column
    if none_valid_row is not None:
        valid[:, none_valid_row] = False
    return (jnp.array(tk), jnp.array(wk), jnp.array(wv), jnp.array(valid))


def test_epipolar_attention_matches_reference(rng):
    args = _case(rng)
    want = np.asarray(epipolar_attention_reference(*args))
    got = np.asarray(epipolar_attention(*args, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_epipolar_attention_all_invalid_slot(rng):
    """A voxel column with zero valid neighbors must produce exactly 0."""
    args = _case(rng, none_valid_row=2)
    got = np.asarray(epipolar_attention(*args, interpret=True))
    want = np.asarray(epipolar_attention_reference(*args))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    assert np.abs(got[2]).max() == 0.0


def test_epipolar_attention_odd_tile(rng):
    """P not divisible by the tile size falls back to whole-row blocks."""
    args = _case(rng, p=300)
    want = np.asarray(epipolar_attention_reference(*args))
    got = np.asarray(epipolar_attention(*args, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_epipolar_attention_two_neighbors(rng):
    args = _case(rng, n=2, s=3, p=128)
    want = np.asarray(epipolar_attention_reference(*args))
    got = np.asarray(epipolar_attention(*args, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_transformer_pallas_path_matches_default(rng):
    """EpipolarTransformer(use_pallas=True) == the jnp attention path."""
    import jax

    from estdepth_tpu.models.est_transformer import EpipolarTransformer

    b, d, h, w, c = 1, 4, 8, 16, 16
    tk = jnp.array(rng.normal(size=(b, d, h, w, c)), jnp.float32)
    tv = jnp.array(rng.normal(size=(b, d, h, w, c)), jnp.float32)
    wk = jnp.array(rng.normal(size=(3, b, d, h, w, c)), jnp.float32)
    wv = jnp.array(rng.normal(size=(3, b, d, h, w, c)), jnp.float32)
    valid = jnp.array([[True], [True], [False]])

    ref_m = EpipolarTransformer(c)
    params = ref_m.init(jax.random.key(0), tk, tv, wk, wv, valid)
    want = ref_m.apply(params, tk, tv, wk, wv, valid)

    pal_m = EpipolarTransformer(c, use_pallas=True, pallas_interpret=True)
    got = pal_m.apply(params, tk, tv, wk, wv, valid)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_model_pallas_attention_matches_default(rng):
    """Full DepthNetHybrid streaming step with use_pallas_attention=True
    (interpret mode) == the default XLA attention path, same weights."""
    import jax

    from estdepth_tpu.models import DepthNetHybrid, ESTMemory

    base = dict(
        ndepths=8, depth_min=0.5, depth_max=8.0, resnet=18,
        est_transformer=True,
    )
    m0 = DepthNetHybrid(**base)
    m1 = DepthNetHybrid(
        **base, use_pallas_attention=True, pallas_interpret=True
    )

    imgs = jnp.array(
        rng.uniform(0, 255, (1, 3, 64, 96, 3)), jnp.float32
    )
    poses = np.tile(np.eye(4, dtype=np.float32)[None, None], (1, 3, 1, 1))
    for i in range(3):
        poses[0, i, 0, 3] = 0.05 * i
    poses = jnp.array(poses)
    intr = jnp.array(
        [[[80.0, 0, 47.5], [0, 80.0, 31.5], [0, 0, 1]]], jnp.float32
    )
    variables = m0.init(jax.random.key(0), imgs, poses, intr, train=False)

    mem = ESTMemory.create(1, 2, 8, 16, 24, 16)
    mem = mem.replace(
        keys=jnp.array(rng.normal(size=mem.keys.shape), jnp.float32),
        values=jnp.array(
            np.tanh(rng.normal(size=mem.values.shape)), jnp.float32
        ),
        poses=poses[:, :2],
        valid=jnp.ones_like(mem.valid),
    )

    out0, _ = m0.apply(variables, imgs, poses, intr, memory=mem,
                       use_est=True, train=False)
    out1, _ = m1.apply(variables, imgs, poses, intr, memory=mem,
                       use_est=True, train=False)
    np.testing.assert_allclose(
        np.asarray(out1["depth"]), np.asarray(out0["depth"]),
        rtol=1e-4, atol=1e-4,
    )
