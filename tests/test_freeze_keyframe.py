"""Freeze controls + keyframe eval dataset."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from estdepth_tpu.train.schedule import warmup_multistep_schedule
from estdepth_tpu.train.trainer import make_optimizer


def test_frozen_prefixes_zero_updates():
    tx = make_optimizer(
        warmup_multistep_schedule(1e-3, 100, warmup_steps=0),
        weight_decay=0.0,
        frozen_prefixes=("matching_feature",),
    )
    params = {
        "matching_feature": {"w": jnp.ones((3, 3))},
        "decoder": {"w": jnp.ones((3, 3))},
    }
    grads = jax.tree.map(jnp.ones_like, params)
    state = tx.init(params)
    updates, _ = tx.update(grads, state, params)
    assert float(jnp.abs(updates["matching_feature"]["w"]).max()) == 0.0
    assert float(jnp.abs(updates["decoder"]["w"]).max()) > 0.0


def test_keyframe_window_indices():
    from estdepth_tpu.data.keyframe_eval import KeyframeEvalDataset

    # reference scannet_select.py:79-82
    assert KeyframeEvalDataset.window_indices(100) == [90, 100, 80, 70, 60]
    assert KeyframeEvalDataset.window_indices(5) == [15, 5, 25, 35, 45]


def test_keyframe_dataset_reads(tmp_path, rng):
    cv2 = pytest.importorskip("cv2")

    from estdepth_tpu.data.keyframe_eval import KeyframeEvalDataset

    scene = "scene0000_00"
    sp = tmp_path / scene
    for sub in ("rgb", "depth", "pose"):
        os.makedirs(sp / sub)
    for i in [60, 70, 80, 90, 100]:
        cv2.imwrite(str(sp / "rgb" / f"{i}.jpg"),
                    rng.integers(0, 255, (48, 64, 3), dtype=np.uint8))
        cv2.imwrite(str(sp / "depth" / f"{i}.png"),
                    rng.integers(500, 4000, (48, 64)).astype(np.uint16))
        np.savetxt(str(sp / "pose" / f"{i}.txt"), np.eye(4))
    listfile = tmp_path / "keyframes.txt"
    listfile.write_text(f"{scene} 100\n")

    ds = KeyframeEvalDataset(str(tmp_path), str(listfile), height=32, width=40)
    assert len(ds) == 1
    s = ds[0]
    assert s["imgs"].shape == (1, 5, 32, 40, 3)
    assert s["dmaps"].shape == (1, 3, 32, 40)
    assert s["scene"] == scene
