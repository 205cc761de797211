"""Whole-sequence ESTM evaluation as a single lax.scan program.

The reference processes long videos with a Python per-frame loop
(eval_hybrid_seq.py:169-193). For offline evaluation on TPU the natural
design is one compiled program per scene: windows slide inside a `lax.scan`
with the ESTMemory FIFO as the carry, so there is zero per-frame dispatch
or host traffic — the TPU-native expression of SURVEY.md §5.7's "fixed-shape
ring buffer threaded through lax.scan".

Semantics match the streaming driver exactly: the first window runs without
EST fusion (reference flag, hybrid_depth_decoder.py:423), every later
window fuses in-window neighbors + the memory.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from estdepth_tpu.models import DepthNetHybrid, ESTMemory


def make_sequence_processor(
    model: DepthNetHybrid,
    lwindow: int = 3,
    memory_size: int = 2,
    reference_pose_pairing: bool = False,
):
    """Returns jitted fn(variables, frames, poses, intr) -> depths.

    frames: [B, T, H, W, 3] (0..255), poses: [B, T, 4, 4], intr: [B, 3, 3].
    Returns [B, T - lwindow + 1, 4, H, W]: center-frame depth (4 scales) of
    each sliding window, in frame order.

    reference_pose_pairing: reproduce the reference's stale memory-pose
    bookkeeping (see ESTMemory.push) for parity validation.
    """

    def window_step(variables, imgs, poses, intr, memory, use_est):
        outputs, (key, value, pose) = model.apply(
            variables, imgs, poses, intr,
            memory=memory if use_est else None,
            use_est=use_est, train=False,
        )
        return outputs["depth"][:, 0], memory.push(
            key, value, pose, reference_pose_pairing=reference_pose_pairing,
        )

    def process(variables, frames, poses, intr):
        b, t = frames.shape[0], frames.shape[1]
        h, w = frames.shape[2], frames.shape[3]
        n_windows = t - lwindow + 1
        memory = ESTMemory.create(
            b, memory_size, model.ndepths, h // 4, w // 4, 16,
            dtype=frames.dtype,
        )

        # first window: no EST fusion (empty memory)
        d0, memory = window_step(
            variables, frames[:, :lwindow], poses[:, :lwindow], intr,
            memory, use_est=False,
        )

        def body(memory, start):
            imgs_w = jax.lax.dynamic_slice_in_dim(frames, start, lwindow, 1)
            poses_w = jax.lax.dynamic_slice_in_dim(poses, start, lwindow, 1)
            depth, memory = window_step(
                variables, imgs_w, poses_w, intr, memory, use_est=True,
            )
            return memory, depth

        _, rest = jax.lax.scan(
            body, memory, jnp.arange(1, n_windows)
        )  # rest: [NW-1, B, 4, H, W]
        all_depths = jnp.concatenate([d0[None], rest], axis=0)
        return jnp.moveaxis(all_depths, 0, 1)  # [B, NW, 4, H, W]

    return jax.jit(process)
