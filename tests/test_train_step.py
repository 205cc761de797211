"""Multi-device DP train step on the virtual 8-CPU mesh (SURVEY.md §4)."""

import numpy as np

import jax
import jax.numpy as jnp

from estdepth_tpu.data.synthetic import SyntheticSceneConfig, synthetic_window
from estdepth_tpu.models import DepthNetHybrid
from estdepth_tpu.parallel.mesh import create_mesh, replicate, shard_batch
from estdepth_tpu.train.schedule import warmup_multistep_schedule
from estdepth_tpu.train.trainer import (
    create_train_state,
    make_optimizer,
    make_train_step,
)


def _tiny_batch(batch=8):
    cfg = SyntheticSceneConfig(height=64, width=96, focal=80.0)
    w = synthetic_window(cfg, n_frames=3, depth_min=0.5, depth_max=8.0, batch=batch)
    return {k: jnp.asarray(v) for k, v in w.items()}


def test_dp_train_step_8_devices():
    assert len(jax.devices()) == 8
    mesh = create_mesh()
    model = DepthNetHybrid(
        ndepths=8, depth_min=0.5, depth_max=8.0, resnet=18,
        est_transformer=True, bn_axis_name="data",
    )
    batch = _tiny_batch(8)
    sched = warmup_multistep_schedule(1e-3, steps_per_epoch=100, warmup_steps=10)
    tx = make_optimizer(sched)

    # init on one shard's worth of data (shapes identical), then replicate
    local = jax.tree.map(lambda x: x[:1], batch)
    state = create_train_state(model, jax.random.key(0), local, tx)
    state = replicate(state, mesh)
    sharded = shard_batch(batch, mesh)

    step = make_train_step(model, tx, mesh, 0.5, 8.0)
    p0 = jax.tree.map(lambda x: np.asarray(x), state.params)

    state, scalars = step(state, sharded, jnp.float32(10.0))
    loss1 = float(scalars["loss"])
    assert np.isfinite(loss1)
    assert int(state.step) == 1

    # params moved
    diffs = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - b).max()), state.params, p0
    )
    assert max(jax.tree_util.tree_leaves(diffs)) > 0

    state, scalars = step(state, sharded, jnp.float32(10.0))
    assert np.isfinite(float(scalars["loss"]))
    assert np.isfinite(float(scalars["grad_norm"]))


def test_schedule_values():
    sched = warmup_multistep_schedule(
        4e-5, steps_per_epoch=1000, milestones_epochs=(2, 4), gamma=0.5,
        warmup_steps=500, warmup_factor=1.0 / 3.0,
    )
    np.testing.assert_allclose(float(sched(0)), 4e-5 / 3.0, rtol=1e-6)
    np.testing.assert_allclose(float(sched(500)), 4e-5, rtol=1e-6)
    np.testing.assert_allclose(float(sched(1999)), 4e-5, rtol=1e-6)
    np.testing.assert_allclose(float(sched(2000)), 2e-5, rtol=1e-6)
    np.testing.assert_allclose(float(sched(4000)), 1e-5, rtol=1e-6)
