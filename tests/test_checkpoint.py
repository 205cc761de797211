"""Orbax checkpoint save/restore roundtrip (the reference's torch.save +
--resume flow, train_hybrid.py:137-151,312-324)."""

import numpy as np

import jax
import jax.numpy as jnp

from estdepth_tpu.data.synthetic import SyntheticSceneConfig, synthetic_window
from estdepth_tpu.models import DepthNetHybrid
from estdepth_tpu.train.schedule import warmup_multistep_schedule
from estdepth_tpu.train.trainer import create_train_state, make_optimizer
from estdepth_tpu.utils.checkpoint import CheckpointManager


def test_save_restore_roundtrip(tmp_path):
    model = DepthNetHybrid(
        ndepths=8, depth_min=0.5, depth_max=8.0, resnet=18, est_transformer=True
    )
    cfg = SyntheticSceneConfig(height=64, width=96, focal=80.0)
    batch = {
        k: jnp.asarray(v)
        for k, v in synthetic_window(cfg, n_frames=3, depth_min=0.5,
                                     depth_max=8.0).items()
    }
    tx = make_optimizer(warmup_multistep_schedule(1e-4, 100))
    state = create_train_state(model, jax.random.key(0), batch, tx)
    state = state.replace(step=jnp.asarray(42, jnp.int32))

    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(42, jax.device_get(state))
    assert mgr.latest_step() == 42

    # restore into a freshly initialized template
    template = create_train_state(model, jax.random.key(1), batch, tx)
    restored = mgr.restore(jax.device_get(template))
    mgr.close()

    assert int(restored.step) == 42
    want = jax.tree_util.tree_leaves(jax.device_get(state.params))
    got = jax.tree_util.tree_leaves(restored.params)
    assert len(want) == len(got)
    for a, b in zip(want, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
