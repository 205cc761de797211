"""Sequential vs parallel EST fusion semantics."""

import numpy as np

import jax
import jax.numpy as jnp

from estdepth_tpu.data.synthetic import SyntheticSceneConfig, synthetic_window
from estdepth_tpu.models import DepthNetHybrid, ESTMemory


def _setup(v, seq_fusion):
    model = DepthNetHybrid(
        ndepths=8, depth_min=0.5, depth_max=8.0, resnet=18,
        est_transformer=True, sequential_fusion=seq_fusion,
    )
    cfg = SyntheticSceneConfig(height=64, width=96, focal=80.0)
    w = synthetic_window(cfg, n_frames=v, depth_min=0.5, depth_max=8.0)
    return model, (
        jnp.asarray(w["imgs"]), jnp.asarray(w["cam_poses"]),
        jnp.asarray(w["cam_intr"]),
    )


def test_sequential_equals_parallel_single_target():
    """num == 1 (ESTM window): fusion order is irrelevant, paths identical."""
    model_s, (imgs, poses, intr) = _setup(3, True)
    model_p, _ = _setup(3, False)
    mem = ESTMemory.create(1, 2, 8, 16, 24, 16)
    key = jax.random.key(0)
    variables = jax.jit(
        lambda r, i, p, k: model_s.init(r, i, p, k, train=False)
    )(key, imgs, poses, intr)
    mem = mem.replace(
        keys=jax.random.normal(jax.random.key(1), mem.keys.shape) * 0.1,
        values=jnp.tanh(jax.random.normal(jax.random.key(2), mem.values.shape)),
        valid=jnp.ones_like(mem.valid),
    )
    out_s, _ = model_s.apply(variables, imgs, poses, intr, memory=mem,
                             use_est=True, train=False)
    out_p, _ = model_p.apply(variables, imgs, poses, intr, memory=mem,
                             use_est=True, train=False)
    np.testing.assert_allclose(
        np.asarray(out_s["depth"]), np.asarray(out_p["depth"]), atol=1e-5
    )


def test_sequential_differs_with_multiple_targets():
    """num == 3 (train/joint window): sequential fusion chains state through
    earlier targets (hybrid_depth_decoder.py:253), parallel does not."""
    model_s, (imgs, poses, intr) = _setup(5, True)
    model_p, _ = _setup(5, False)
    variables = jax.jit(
        lambda r, i, p, k: model_s.init(r, i, p, k, train=True)
    )(jax.random.key(0), imgs, poses, intr)
    params = {"params": variables["params"],
              "batch_stats": variables["batch_stats"]}
    out_s, _ = model_s.apply(params, imgs, poses, intr, use_est=True,
                             train=False)
    out_p, _ = model_p.apply(params, imgs, poses, intr, use_est=True,
                             train=False)
    ds = np.asarray(out_s["depth"])
    dp = np.asarray(out_p["depth"])
    # target 0 fuses against pre-fusion neighbors in both modes... but its
    # neighbors include target 1 whose value is still pre-fusion in both ->
    # target 0 identical; targets 1,2 must differ.
    np.testing.assert_allclose(ds[:, 0], dp[:, 0], atol=1e-4)
    assert np.abs(ds[:, 1] - dp[:, 1]).max() > 1e-5
