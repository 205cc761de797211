"""Shape/behavior tests for the NN stack (SURVEY.md §4 test strategy)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from estdepth_tpu.models import (
    DepthNetHybrid,
    EpipolarTransformer,
    ESTMemory,
    PSMFeatureNet,
    ResNetEncoder,
)


def _poses(v):
    p = np.tile(np.eye(4, dtype=np.float32)[None, None], (1, v, 1, 1))
    for i in range(v):
        p[0, i, 0, 3] = 0.05 * i  # small x-translation sequence
    return p


def _intr(w=96, h=64):
    return np.array(
        [[[80.0, 0, (w - 1) / 2], [0, 80.0, (h - 1) / 2], [0, 0, 1]]],
        dtype=np.float32,
    )


def test_psm_output_shape(rng):
    m = PSMFeatureNet()
    x = jnp.array(rng.normal(size=(2, 64, 96, 3)), jnp.float32)
    params = m.init(jax.random.key(0), x)
    y = m.apply(params, x)
    assert y.shape == (2, 16, 24, 32)  # stride 4, 32 channels


def test_resnet_feature_pyramid(rng):
    m = ResNetEncoder(depth=50)
    x = jnp.array(rng.normal(size=(1, 64, 96, 3)), jnp.float32)
    params = m.init(jax.random.key(0), x)
    feats = m.apply(params, x)
    shapes = [f.shape for f in feats]
    assert shapes == [
        (1, 32, 48, 64),
        (1, 16, 24, 256),
        (1, 8, 12, 512),
        (1, 4, 6, 1024),
        (1, 2, 3, 2048),
    ]
    # post-ReLU maps are non-negative (resnet_encoder.py:51)
    for f in feats:
        assert float(jnp.min(f)) >= 0.0


def test_resnet18_channels(rng):
    m = ResNetEncoder(depth=18)
    x = jnp.array(rng.normal(size=(1, 64, 64, 3)), jnp.float32)
    params = m.init(jax.random.key(0), x)
    feats = m.apply(params, x)
    assert [f.shape[-1] for f in feats] == [64, 64, 128, 256, 512]


def test_est_zero_neighbors_matches_none(rng):
    """All-invalid neighbors must reduce to the zero-h GRU fallback
    (epipolar_transformer.py:78-79)."""
    b, d, h, w, c = 1, 4, 6, 8, 16
    m = EpipolarTransformer(c)
    tk = jnp.array(rng.normal(size=(b, d, h, w, c)), jnp.float32)
    tv = jnp.array(rng.normal(size=(b, d, h, w, c)), jnp.float32)
    wk = jnp.array(rng.normal(size=(2, b, d, h, w, c)), jnp.float32)
    wv = jnp.array(rng.normal(size=(2, b, d, h, w, c)), jnp.float32)
    params = m.init(jax.random.key(0), tk, tv, wk, wv)

    none = m.apply(params, tk, tv, None, None)
    invalid = m.apply(
        params, tk, tv, wk, wv, jnp.zeros((2, b), jnp.bool_)
    )
    np.testing.assert_allclose(np.asarray(none), np.asarray(invalid), atol=1e-6)


def test_est_padding_invariance(rng):
    """Adding masked-out padded neighbors must not change the fusion."""
    b, d, h, w, c = 1, 4, 6, 8, 16
    m = EpipolarTransformer(c)
    tk = jnp.array(rng.normal(size=(b, d, h, w, c)), jnp.float32)
    tv = jnp.array(rng.normal(size=(b, d, h, w, c)), jnp.float32)
    wk = jnp.array(rng.normal(size=(2, b, d, h, w, c)), jnp.float32)
    wv = jnp.array(rng.normal(size=(2, b, d, h, w, c)), jnp.float32)
    params = m.init(jax.random.key(0), tk, tv, wk, wv)

    out2 = m.apply(params, tk, tv, wk, wv, jnp.ones((2, b), jnp.bool_))

    pad_k = jnp.concatenate([wk, jnp.array(rng.normal(size=(2, b, d, h, w, c)),
                                           jnp.float32)], 0)
    pad_v = jnp.concatenate([wv, jnp.array(rng.normal(size=(2, b, d, h, w, c)),
                                           jnp.float32)], 0)
    valid = jnp.array([[True], [True], [False], [False]])
    out4 = m.apply(params, tk, tv, pad_k, pad_v, valid)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out4), atol=1e-5)


@pytest.mark.parametrize("est_on,mem", [(False, False), (True, False), (True, True)])
def test_depthnet_forward_modes(rng, est_on, mem):
    """Full model forward: joint (V=5) and streaming (V=3 + memory)."""
    v = 3 if mem else 5
    h_img, w_img, nd = 64, 96, 8
    model = DepthNetHybrid(
        ndepths=nd, depth_min=0.5, depth_max=5.0, resnet=18,
        est_transformer=est_on,
    )
    imgs = jnp.array(rng.uniform(0, 255, size=(1, v, h_img, w_img, 3)), jnp.float32)
    poses = jnp.array(_poses(v))
    intr = jnp.array(_intr(w_img, h_img))
    memory = (
        ESTMemory.create(1, 2, nd, h_img // 4, w_img // 4, 16)
        if mem
        else None
    )
    variables = model.init(
        jax.random.key(0), imgs, poses, intr, memory=memory, train=False
    )
    outputs, (key, value, pose) = model.apply(
        variables, imgs, poses, intr, memory=memory, train=False
    )
    t = v - 2
    assert outputs["depth"].shape == (1, t, 4, h_img, w_img)
    assert outputs["init_prob"].shape == (1, t, h_img, w_img)
    assert np.isfinite(np.asarray(outputs["depth"])).all()
    d = np.asarray(outputs["depth"])
    assert d.min() >= 0.0 and d.max() <= 5.0 + 1e-3
    assert key.shape == (1, nd, h_img // 4, w_img // 4, 16)
    assert pose.shape == (1, 4, 4)

    if mem:
        new_mem = memory.push(key, value, pose)
        assert bool(new_mem.valid[0, -1])
        assert not bool(new_mem.valid[0, 0])
        # second streaming step with a half-filled memory
        outputs2, _ = model.apply(
            variables, imgs, poses, intr, memory=new_mem, train=False
        )
        assert np.isfinite(np.asarray(outputs2["depth"])).all()


def test_depthnet_train_mode_updates_bn(rng):
    model = DepthNetHybrid(
        ndepths=8, depth_min=0.5, depth_max=5.0, resnet=18, est_transformer=True
    )
    imgs = jnp.array(rng.uniform(0, 255, size=(1, 3, 64, 96, 3)), jnp.float32)
    poses = jnp.array(_poses(3))
    intr = jnp.array(_intr())
    variables = model.init(jax.random.key(0), imgs, poses, intr, train=True)
    assert "batch_stats" in variables
    (outputs, _), updates = model.apply(
        variables, imgs, poses, intr, train=True, mutable=["batch_stats"]
    )
    # running stats moved away from init
    leaf = jax.tree_util.tree_leaves(updates["batch_stats"])[0]
    assert np.isfinite(np.asarray(leaf)).all()
