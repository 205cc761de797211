"""Decomp3DConv: 3x3x3 convs as depth-shifted conv2ds (models/layers.py).

Exactly the same arithmetic as the 3D conv — the restructuring targets
XLA's conv3d BACKWARD, whose {C-minor, batch-sublane} padded gradient
temps dominate the train step's HBM (ARCHITECTURE.md headroom #1).
Checkpoint-compatible by construction (identical parameter tree).
"""

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from estdepth_tpu.data.synthetic import SyntheticSceneConfig, synthetic_stream
from estdepth_tpu.models import DepthNetHybrid, ESTMemory
from estdepth_tpu.models.layers import Decomp3DConv

import pytest

# full-model exactness A/B (~5 min on this box)
pytestmark = pytest.mark.slow


def _pair(shape=(2, 6, 10, 12, 8), co=16, use_bias=False):
    plain = nn.Conv(co, (3, 3, 3), padding=[(1, 1)] * 3, use_bias=use_bias)
    decomp = Decomp3DConv(co, (3, 3, 3), use_bias=use_bias)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    v = plain.init(jax.random.key(0), x)
    return plain, decomp, v, x


def test_decomp_equals_conv3d():
    """Same params ("kernel"/"bias" under the same names), same output."""
    plain, decomp, v, x = _pair(use_bias=True)
    a = plain.apply(v, x)
    b = decomp.apply(v, x)  # the decomposed module loads the plain init
    np.testing.assert_allclose(
        np.asarray(b), np.asarray(a), rtol=2e-5, atol=2e-5
    )


def test_decomp_gradients_match():
    """d(loss)/d(x, kernel) through the decomposition equals the 3D conv's
    (the whole point: an exact drop-in whose BACKWARD avoids the padded
    3D-conv gradient temps)."""
    plain, decomp, v, x = _pair()

    def grads(mod):
        def loss(vv, xx):
            return jnp.sum(jnp.sin(mod.apply(vv, xx)))
        return jax.grad(loss, argnums=(0, 1))(v, x)

    (gv_a, gx_a) = grads(plain)
    (gv_b, gx_b) = grads(decomp)
    np.testing.assert_allclose(
        np.asarray(gx_b), np.asarray(gx_a), rtol=1e-4, atol=1e-5
    )
    ka = gv_a["params"]["kernel"]
    kb = gv_b["params"]["kernel"]
    np.testing.assert_allclose(
        np.asarray(kb), np.asarray(ka), rtol=1e-4, atol=1e-4
    )


def test_model_conv3d_as2d_equivalence():
    """DepthNetHybrid(conv3d_as2d=True): identical parameter tree, matching
    outputs AND parameter gradients on the full EST path."""
    h, w, nd = 64, 96, 8
    kw = dict(
        ndepths=nd, depth_min=0.5, depth_max=8.0, resnet=18,
        est_transformer=True,
    )
    plain = DepthNetHybrid(conv3d_as2d=False, **kw)
    as2d = DepthNetHybrid(**kw)  # conv3d_as2d=True is the shipped default

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

    out_a, _ = jax.jit(
        lambda v: plain.apply(v, imgs, poses, intr, memory=memory,
                              use_est=True, train=False)
    )(variables)
    out_b, _ = jax.jit(
        lambda v: as2d.apply(v, imgs, poses, intr, memory=memory,
                             use_est=True, train=False)
    )(variables)
    np.testing.assert_allclose(
        np.asarray(out_b["depth"]), np.asarray(out_a["depth"]),
        rtol=2e-4, atol=2e-4,
    )

    # parameter gradients through the full model (train-mode BN)
    def loss_fn(model):
        def loss(params):
            (out, _state), _ = model.apply(
                {"params": params,
                 "batch_stats": variables["batch_stats"]},
                imgs, poses, intr, memory=memory, use_est=True,
                train=True, mutable=["batch_stats"],
            )
            return jnp.mean(jnp.abs(out["depth"]))
        return jax.grad(loss)(variables["params"])

    g_a = loss_fn(plain)
    g_b = loss_fn(as2d)
    flat_a = jax.tree_util.tree_leaves(g_a)
    flat_b = jax.tree_util.tree_leaves(g_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=5e-3, atol=5e-4
        )
