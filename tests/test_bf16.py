"""bf16-model end-to-end smoke tests.

The production configuration runs the model in bfloat16, but most tests use
f32 models — dtype promotion bugs (an f32-param norm layer silently
promoting activations, a state pytree whose dtype differs between carry
input and output) only surface in bf16. These tests pin the bf16 path:
every module output follows the model dtype, the streaming state is
dtype-stable across steps, and the whole-scene lax.scan (which REQUIRES a
dtype-stable carry) compiles and runs.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from estdepth_tpu.models import DepthNetHybrid


@pytest.fixture(scope="module")
def bf16_setup():
    model = DepthNetHybrid(
        ndepths=8, depth_min=0.5, depth_max=8.0, resnet=18,
        est_transformer=True, dtype=jnp.bfloat16,
    )
    h, w, t = 64, 96, 5
    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.uniform(0, 255, (1, t, h, w, 3)).astype(np.float32)
    )
    poses = np.tile(np.eye(4, dtype=np.float32)[None, None], (1, t, 1, 1))
    for i in range(t):
        poses[0, i, 0, 3] = 0.05 * i
    poses = jnp.asarray(poses)
    intr = jnp.asarray(np.array(
        [[[80.0, 0, (w - 1) / 2], [0, 80.0, (h - 1) / 2], [0, 0, 1]]],
        np.float32,
    ))
    variables = jax.jit(
        lambda r: model.init(r, frames[:, :3], poses[:, :3], intr,
                             train=False)
    )(jax.random.key(0))
    return model, variables, frames, poses, intr, h, w


def test_state_and_outputs_follow_model_dtype(bf16_setup):
    model, variables, frames, poses, intr, h, w = bf16_setup
    outputs, (key, value, pose) = jax.jit(
        lambda v, i, p, k: model.apply(v, i, p, k, train=False)
    )(variables, frames[:, :3], poses[:, :3], intr)
    # streaming state must be bf16 so ESTMemory.push stays promotion-free
    assert key.dtype == jnp.bfloat16, key.dtype
    assert value.dtype == jnp.bfloat16, value.dtype
    # depth maps are fp32 (softargmin/sigmoid heads run fp32 by design)
    assert outputs["depth"].dtype == jnp.float32
    assert bool(jnp.all(jnp.isfinite(outputs["depth"])))


def test_streaming_memory_dtype_stable(bf16_setup):
    from estdepth_tpu.eval.estm import ESTMRunner

    model, variables, frames, poses, intr, h, w = bf16_setup
    runner = ESTMRunner(model, variables, h, w, lwindow=3, memory_size=2)
    assert runner.memory.keys.dtype == jnp.bfloat16
    out = None
    for i in range(4):
        out = runner.push_frame(
            np.asarray(frames[0, i]), np.asarray(poses[0, i]),
            np.asarray(intr[0]),
        )
    assert out is not None
    # the donated FIFO must keep its dtype across pushes (a promotion here
    # would re-specialize the jit and break buffer donation)
    assert runner.memory.keys.dtype == jnp.bfloat16
    assert runner.memory.values.dtype == jnp.bfloat16
    assert np.all(np.isfinite(np.asarray(out, np.float32)))


def test_scan_sequence_processor_bf16(bf16_setup):
    from estdepth_tpu.eval.sequence import make_sequence_processor

    model, variables, frames, poses, intr, h, w = bf16_setup
    proc = make_sequence_processor(
        model, 3, 2, output_scales=(0, 2), output_dtype=jnp.bfloat16
    )
    d = proc(variables, frames, poses, intr)
    assert d.shape == (1, 3, 2, h, w)
    assert d.dtype == jnp.bfloat16
    assert bool(jnp.all(jnp.isfinite(d.astype(jnp.float32))))
