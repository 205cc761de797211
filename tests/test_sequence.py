"""lax.scan sequence processor == the per-frame streaming driver."""

import numpy as np

import jax
import jax.numpy as jnp

from estdepth_tpu.data.synthetic import SyntheticSceneConfig, synthetic_stream
from estdepth_tpu.eval.estm import ESTMRunner
from estdepth_tpu.eval.sequence import make_sequence_processor
from estdepth_tpu.models import DepthNetHybrid

import pytest

# whole-scene lax.scan equivalence
pytestmark = pytest.mark.slow


def test_scan_sequence_matches_streaming():
    h, w, nd = 64, 96, 8
    model = DepthNetHybrid(
        ndepths=nd, depth_min=0.5, depth_max=8.0, resnet=18,
        est_transformer=True,
    )
    cfg = SyntheticSceneConfig(height=h, width=w, focal=80.0)
    frames = list(synthetic_stream(cfg, n_frames=7, depth_min=0.5,
                                   depth_max=8.0))
    imgs = jnp.asarray(np.stack([f["img"] for f in frames])[None])
    poses = jnp.asarray(np.stack([f["cam_pose"] for f in frames])[None])
    intr = jnp.asarray(frames[0]["cam_intr"][None])

    variables = jax.jit(
        lambda r, i, p, k: model.init(r, i, p, k, train=False)
    )(jax.random.key(0), imgs[:, :3], poses[:, :3], intr)

    process = make_sequence_processor(model, lwindow=3, memory_size=2)
    scan_depths = process(variables, imgs, poses, intr)  # [1, 5, 4, H, W]
    assert scan_depths.shape == (1, 5, 4, h, w)

    runner = ESTMRunner(model, variables, h, w, lwindow=3, memory_size=2)
    stream_depths = []
    for f in frames:
        d = runner.push_frame(f["img"], f["cam_pose"], f["cam_intr"])
        if d is not None:
            stream_depths.append(np.asarray(d[0]))
    stream_depths = np.stack(stream_depths)  # [5, 4, H, W]

    np.testing.assert_allclose(
        np.asarray(scan_depths[0]), stream_depths, rtol=1e-3, atol=2e-3
    )


def test_chunked_processor_matches_streaming():
    """SequenceProcessor (fixed-size chunks, carried memory + window
    overlap, tail padding) == per-frame streaming, window for window."""
    from estdepth_tpu.eval.sequence import SequenceProcessor

    h, w, nd = 64, 96, 8
    model = DepthNetHybrid(
        ndepths=nd, depth_min=0.5, depth_max=8.0, resnet=18,
        est_transformer=True,
    )
    cfg = SyntheticSceneConfig(height=h, width=w, focal=80.0)
    frames = list(synthetic_stream(cfg, n_frames=9, depth_min=0.5,
                                   depth_max=8.0))
    imgs = np.stack([f["img"] for f in frames]).astype(np.float32)
    poses = np.stack([f["cam_pose"] for f in frames])
    intr = frames[0]["cam_intr"]

    variables = jax.jit(
        lambda r, i, p, k: model.init(r, i, p, k, train=False)
    )(jax.random.key(0), jnp.asarray(imgs[None, :3]),
      jnp.asarray(poses[None, :3]), jnp.asarray(intr[None]))

    # chunk 5 / stride 3: exercises first chunk, continuation, and padding
    proc = SequenceProcessor(model, variables, lwindow=3, memory_size=2,
                             chunk=5)
    chunked = proc.process_scene(imgs, poses, intr)  # [7, 4, H, W]
    assert chunked.shape == (7, 4, h, w)

    runner = ESTMRunner(model, variables, h, w, lwindow=3, memory_size=2)
    stream = []
    for f in frames:
        d = runner.push_frame(f["img"], f["cam_pose"], f["cam_intr"])
        if d is not None:
            stream.append(np.asarray(d[0]))
    stream = np.stack(stream)

    np.testing.assert_allclose(chunked, stream, rtol=1e-3, atol=2e-3)


def test_batched_scenes_match_independent_runs():
    """process_scenes(B scenes of DIFFERENT lengths/content/intrinsics)
    == B separate process_scene runs (batch axis never mixes; padded
    windows dropped)."""
    from estdepth_tpu.eval.sequence import SequenceProcessor

    h, w, nd = 64, 96, 8
    model = DepthNetHybrid(
        ndepths=nd, depth_min=0.5, depth_max=8.0, resnet=18,
        est_transformer=True,
    )
    cfgs = [
        SyntheticSceneConfig(height=h, width=w, focal=80.0, seed=3,
                             plane_offset=2.2, step_x=0.06),
        SyntheticSceneConfig(height=h, width=w, focal=76.0, seed=9,
                             plane_offset=3.0, step_x=0.1,
                             yaw_per_frame=0.02),
    ]
    lengths = [9, 6]  # different lengths: exercises per-scene padding
    scenes = []
    for cfg, t in zip(cfgs, lengths):
        frames = list(synthetic_stream(cfg, n_frames=t, depth_min=0.5,
                                       depth_max=8.0))
        scenes.append((
            np.stack([f["img"] for f in frames]).astype(np.float32),
            np.stack([f["cam_pose"] for f in frames]),
            frames[0]["cam_intr"],
        ))

    variables = jax.jit(
        lambda r, i, p, k: model.init(r, i, p, k, train=False)
    )(jax.random.key(0), jnp.asarray(scenes[0][0][None, :3]),
      jnp.asarray(scenes[0][1][None, :3]), jnp.asarray(scenes[0][2][None]))

    proc = SequenceProcessor(model, variables, lwindow=3, memory_size=2,
                             chunk=5)
    batched = proc.process_scenes(scenes)
    singles = [proc.process_scene(*s) for s in scenes]

    assert len(batched) == 2
    for got, want, t in zip(batched, singles, lengths):
        assert got.shape == (t - 2, 4, h, w)
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-3)
