"""uint8 frame ingestion (round 4): the eval datasets ship uint8 frames
(data/io_utils.read_image_rgb dtype=np.uint8) and every eval driver
uploads them AS uint8 — 1/4 the host->device bytes of float32, a material
streaming cost — casting to float on DEVICE (models/estdepth.py). The
reference's own pipeline decodes/resizes in uint8 and casts at tensor
conversion (general_eval_seq.py:184-204), so integer-valued frames are
bit-identical either way; these tests pin that bit-identity through the
streaming runner and the chunked scan processor.
"""
import numpy as np

import jax
import jax.numpy as jnp

from estdepth_tpu.eval.estm import ESTMRunner
from estdepth_tpu.eval.sequence import SequenceProcessor
from estdepth_tpu.models import DepthNetHybrid


def _setup(n_frames):
    h, w, nd = 64, 96, 8
    model = DepthNetHybrid(
        ndepths=nd, depth_min=0.01, depth_max=10.0, resnet=18,
        est_transformer=True,
    )
    rng = np.random.default_rng(7)
    frames = rng.integers(0, 256, size=(n_frames, h, w, 3)).astype(np.uint8)
    poses = np.tile(np.eye(4, dtype=np.float32)[None], (n_frames, 1, 1))
    poses[:, 0, 3] = 0.05 * np.arange(n_frames)
    intr = np.array(
        [[60.0, 0.0, (w - 1) / 2], [0.0, 60.0, (h - 1) / 2],
         [0.0, 0.0, 1.0]], np.float32,
    )
    variables = jax.jit(
        lambda r, i, p, k: model.init(r, i, p, k, train=False)
    )(
        jax.random.key(0),
        jnp.asarray(frames[None, :3], jnp.float32),
        jnp.asarray(poses[None, :3]),
        jnp.asarray(intr[None]),
    )
    return model, variables, frames, poses, intr, h, w


def test_streaming_uint8_matches_float32():
    model, variables, frames, poses, intr, h, w = _setup(5)

    def run(cast):
        runner = ESTMRunner(model, variables, h, w, output_scales=(0, 2))
        outs = []
        for f, p in zip(frames, poses):
            d = runner.push_frame(cast(f), p, intr)
            if d is not None:
                outs.append(np.asarray(d))
        return outs

    outs_u8 = run(lambda f: f)
    outs_f32 = run(lambda f: f.astype(np.float32))
    assert len(outs_u8) == len(outs_f32) == 3
    for a, b in zip(outs_u8, outs_f32):
        np.testing.assert_array_equal(a, b)


def test_scan_processor_uint8_matches_float32():
    model, variables, frames, poses, intr, h, w = _setup(8)

    def run(fr):
        proc = SequenceProcessor(
            model, variables, lwindow=3, memory_size=2, chunk=6,
            output_scales=(0, 2),
        )
        return proc.process_scene(fr, poses, intr)

    np.testing.assert_array_equal(
        run(frames), run(frames.astype(np.float32))
    )
