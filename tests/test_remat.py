"""Rematerialized training step is numerically identical to the default."""

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


def test_remat_matches_default():
    mesh = create_mesh(2)
    model = DepthNetHybrid(
        ndepths=8, depth_min=0.5, depth_max=8.0, resnet=18,
        est_transformer=True, bn_axis_name="data",
    )
    cfg = SyntheticSceneConfig(height=64, width=96, focal=80.0)
    batch = synthetic_window(cfg, n_frames=3, depth_min=0.5, depth_max=8.0,
                             batch=2)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    tx = make_optimizer(warmup_multistep_schedule(1e-3, 100, warmup_steps=0))
    local = jax.tree.map(lambda x: x[:1], batch)
    state0 = create_train_state(model, jax.random.key(0), local, tx)

    results = {}
    modes = [
        (False, "nothing"),
        (True, "nothing"),
        (True, "save_features"),  # granular policy: encoders saved
    ]
    for remat, policy in modes:
        # deep-copy: the step donates its state, which would delete the
        # shared arrays for the second mode
        state = replicate(jax.tree.map(jnp.array, state0), mesh)
        sharded = shard_batch(batch, mesh)
        step = make_train_step(
            model, tx, mesh, 0.5, 8.0, remat=remat, remat_policy=policy
        )
        state, scalars = step(state, sharded, jnp.float32(10.0))
        results[(remat, policy)] = (
            float(scalars["loss"]),
            float(scalars["grad_norm"]),
            np.asarray(jax.tree_util.tree_leaves(state.params)[0]),
        )

    base = results[(False, "nothing")]
    for mode in modes[1:]:
        got = results[mode]
        np.testing.assert_allclose(base[0], got[0], rtol=1e-6)
        np.testing.assert_allclose(base[1], got[1], rtol=1e-4)
        np.testing.assert_allclose(base[2], got[2], atol=1e-6)
