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


def test_grad_accum_matches_plain_step_on_duplicated_microbatches():
    """grad_accum=2 over two IDENTICAL microbatches must produce exactly the
    same parameter update as the plain B=1 step on that data: per-microbatch
    BN stats equal the B=1 stats, so the accumulated (averaged) gradient is
    the plain gradient. (BN *running* stats get the momentum update applied
    once per microbatch — expected to differ.)"""
    mesh = create_mesh(1)
    model = DepthNetHybrid(
        ndepths=8, depth_min=0.5, depth_max=8.0, resnet=18,
        est_transformer=True, bn_axis_name="data",
    )
    import optax

    b1 = _tiny_batch(1)
    b2 = jax.tree.map(lambda x: jnp.concatenate([x, x], 0), b1)
    # SGD, not Adam: the update is linear in the gradient, so the
    # comparison tests the accumulation math itself (Adam's g/sqrt(v)
    # amplifies fp-reordering noise on near-zero gradients to +-lr)
    tx = optax.sgd(1e-3)
    state0 = create_train_state(model, jax.random.key(0), b1, tx)

    plain = make_train_step(model, tx, mesh, 0.5, 8.0)
    accum = make_train_step(model, tx, mesh, 0.5, 8.0, grad_accum=2)

    def fresh_state():
        # the step donates its state argument; each call needs its own copy
        return replicate(jax.tree.map(jnp.copy, state0), mesh)

    s_plain, sc_plain = plain(
        fresh_state(), shard_batch(b1, mesh), jnp.float32(10.0)
    )
    s_accum, sc_accum = accum(
        fresh_state(), shard_batch(b2, mesh), jnp.float32(10.0)
    )

    np.testing.assert_allclose(
        float(sc_accum["loss"]), float(sc_plain["loss"]), rtol=1e-5
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        ),
        s_accum.params, s_plain.params,
    )


def test_training_converges_on_fixed_window():
    """Overfit proof: repeated steps on one fixed synthetic window must
    drive the multi-scale loss down substantially — the end-to-end
    evidence that forward, backward, sync-BN, clipping, and Adam actually
    learn (the reference has no equivalent check; its evidence was
    eyeballing train logs)."""
    mesh = create_mesh(1)
    model = DepthNetHybrid(
        ndepths=8, depth_min=0.5, depth_max=8.0, resnet=18,
        est_transformer=True, bn_axis_name="data",
    )
    batch = _tiny_batch(1)
    sched = warmup_multistep_schedule(
        5e-4, steps_per_epoch=1000, warmup_steps=5
    )
    tx = make_optimizer(sched)
    state = replicate(
        create_train_state(model, jax.random.key(0), batch, tx), mesh
    )
    sharded = shard_batch(batch, mesh)
    step = make_train_step(model, tx, mesh, 0.5, 8.0)

    losses = []
    for _ in range(30):
        state, scalars = step(state, sharded, jnp.float32(10.0))
        losses.append(float(scalars["loss"]))
    assert np.all(np.isfinite(losses))
    # robust to step-to-step noise: compare first-5 vs last-5 means
    assert np.mean(losses[-5:]) < 0.6 * np.mean(losses[:5]), losses
