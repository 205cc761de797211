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

Two entry points:
  * make_sequence_processor — one scan over a whole fixed-length clip
    (one compilation per clip length);
  * SequenceProcessor — arbitrary-length scenes in fixed-size chunks with
    the memory (and the lwindow-1 window overlap) carried across chunk
    boundaries: exactly TWO compilations total (first chunk / continuation
    chunk) regardless of scene length, and dispatch cost amortized over
    `chunk` frames instead of paid per frame.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from estdepth_tpu.eval.output import trim_depth
from estdepth_tpu.models import DepthNetHybrid, ESTMemory


def make_sequence_processor(
    model: DepthNetHybrid,
    lwindow: int = 3,
    memory_size: int = 2,
    reference_pose_pairing: bool = False,
    output_scales: tuple = (0, 1, 2, 3),
    output_dtype=None,
):
    """Returns jitted fn(variables, frames, poses, intr) -> depths.

    frames: [B, T, H, W, 3] (0..255), poses: [B, T, 4, 4], intr: [B, 3, 3].
    Returns [B, T - lwindow + 1, S, H, W]: center-frame depth of each
    sliding window, in frame order, S = len(output_scales).

    reference_pose_pairing: reproduce the reference's stale memory-pose
    bookkeeping (see ESTMemory.push) for parity validation.
    output_scales / output_dtype: trim the fetched maps (same knobs as
    ESTMRunner / SequenceProcessor).
    """

    def window_step(variables, imgs, poses, intr, memory, use_est, feats):
        outputs, (key, value, pose) = model.apply(
            variables, imgs, poses, intr,
            memory=memory if use_est else None,
            use_est=use_est, train=False, matching_feats=feats,
        )
        depth = trim_depth(
            outputs["depth"][:, 0], output_scales, output_dtype
        )
        return depth, memory.push(
            key, value, pose, reference_pose_pairing=reference_pose_pairing,
        )

    def process(variables, frames, poses, intr):
        b, t = frames.shape[0], frames.shape[1]
        h, w = frames.shape[2], frames.shape[3]
        n_windows = t - lwindow + 1
        mem_dtype = model.dtype or (
            frames.dtype
            if jnp.issubdtype(frames.dtype, jnp.floating) else jnp.float32
        )
        memory = ESTMemory.create(
            b, memory_size, model.ndepths, h // 4, w // 4, 16,
            dtype=mem_dtype,
        )

        # matching features ONCE per frame, in one big batched encoder call
        # (sliding windows share lwindow-1 frames; recomputing per window
        # would triple the encoder work at lwindow=3)
        feats = model.apply(
            variables, frames.reshape(b * t, h, w, 3),
            method="compute_matching",
        ).reshape(b, t, h // 4, w // 4, -1)

        # first window: no EST fusion (empty memory)
        d0, memory = window_step(
            variables, frames[:, :lwindow], poses[:, :lwindow], intr,
            memory, False, feats[:, :lwindow],
        )

        def body(memory, start):
            imgs_w = jax.lax.dynamic_slice_in_dim(frames, start, lwindow, 1)
            poses_w = jax.lax.dynamic_slice_in_dim(poses, start, lwindow, 1)
            feats_w = jax.lax.dynamic_slice_in_dim(feats, start, lwindow, 1)
            depth, memory = window_step(
                variables, imgs_w, poses_w, intr, memory, True, feats_w,
            )
            return memory, depth

        _, rest = jax.lax.scan(
            body, memory, jnp.arange(1, n_windows)
        )  # rest: [NW-1, B, S, H, W]
        all_depths = jnp.concatenate([d0[None], rest], axis=0)
        return jnp.moveaxis(all_depths, 0, 1)  # [B, NW, S, H, W]

    return jax.jit(process)


def make_joint_processor(
    model: DepthNetHybrid,
    seq_length: int = 5,
    est_on: bool = True,
    reference_pose_pairing: bool = False,
    output_scales: tuple = (0, 1, 2, 3),
    output_dtype=None,
):
    """Whole-scene Joint-mode evaluation as one lax.scan program.

    The Joint driver chains `seq_length`-frame windows advancing by
    seq_length-2 frames, threading the last target's detached key/value
    volume to the next window as a 1-entry EST memory
    (tools/eval_joint.py, reference eval_hybrid.py:229-243). This is that
    exact chain as ONE compiled program: windows slide inside `lax.scan`
    with the 1-entry ESTMemory as the carry, so a whole scene runs with a
    single dispatch — the Joint-mode counterpart of
    `make_sequence_processor` (which is the stride-1 ESTM chain).

    Returns jitted fn(variables, frames, poses, intr) -> depths where
      frames [B, T, H, W, 3] (0..255) is the SAMPLED frame sequence
      (already spaced by the eval frame interval), poses [B, T, 4, 4],
      intr [B, 3, 3]. Result [B, NW, seq_length-2, S, H, W]: each
      window's depth for its seq_length-2 target frames,
      NW = (T - seq_length) // stride + 1 with stride = seq_length - 2.
    Tail frames beyond the window grid are ignored — callers pad T (and
    drop the padded windows' outputs) to reuse one compilation across
    scene lengths; padded windows corrupt only memory entries consumed by
    LATER padded windows, never a real one.

    First window runs without EST fusion (reference flag,
    hybrid_depth_decoder.py:423); every later window fuses in-window
    neighbors + the threaded memory (`est_on=False` evaluates the pure
    stereo path for every window, the --no-est protocol).
    reference_pose_pairing reproduces the reference's stale pose
    bookkeeping — with a 1-entry memory, window 0's last-target pose is
    paired with every later volume (see ESTMemory.push; the loop driver's
    JointRunner documents the same induction).
    """
    lw = seq_length
    stride = seq_length - 2
    assert stride >= 1

    def trim(depth):  # [B, Tt, 4, H, W] -> [B, Tt, S, H, W] (+ cast)
        if tuple(output_scales) != (0, 1, 2, 3):
            depth = depth[:, :, jnp.array(output_scales)]
        if output_dtype is not None:
            depth = depth.astype(output_dtype)
        return depth

    def window_step(variables, imgs, poses, intr, memory, use_est, feats):
        outputs, (key, value, pose) = model.apply(
            variables, imgs, poses, intr,
            memory=memory if use_est else None,
            use_est=use_est, train=False, matching_feats=feats,
        )
        depth = trim(outputs["depth"])
        return depth, memory.push(
            key, value, pose,
            reference_pose_pairing=reference_pose_pairing,
        )

    def process(variables, frames, poses, intr):
        b, t = frames.shape[0], frames.shape[1]
        h, w = frames.shape[2], frames.shape[3]
        n_windows = (t - lw) // stride + 1
        # valid=False start: window 0's push then stores its OWN pose, so
        # the strict-pairing induction starts from window 0's last target
        # exactly like the loop driver
        mem_dtype = model.dtype or (
            frames.dtype
            if jnp.issubdtype(frames.dtype, jnp.floating) else jnp.float32
        )
        memory = ESTMemory.create(
            b, 1, model.ndepths, h // 4, w // 4, 16,
            dtype=mem_dtype,
        )

        # matching features ONCE per frame in one batched encoder call
        # (consecutive windows share lwindow-2 frames)
        feats = model.apply(
            variables, frames.reshape(b * t, h, w, 3),
            method="compute_matching",
        ).reshape(b, t, h // 4, w // 4, -1)

        d0, memory = window_step(
            variables, frames[:, :lw], poses[:, :lw], intr,
            memory, False, feats[:, :lw],
        )

        def body(memory, start):
            imgs_w = jax.lax.dynamic_slice_in_dim(frames, start, lw, 1)
            poses_w = jax.lax.dynamic_slice_in_dim(poses, start, lw, 1)
            feats_w = jax.lax.dynamic_slice_in_dim(feats, start, lw, 1)
            depth, memory = window_step(
                variables, imgs_w, poses_w, intr, memory, est_on, feats_w,
            )
            return memory, depth

        if n_windows > 1:
            _, rest = jax.lax.scan(
                body, memory, jnp.arange(1, n_windows) * stride
            )  # rest: [NW-1, B, Tt, S, H, W]
            all_depths = jnp.concatenate([d0[None], rest], axis=0)
        else:
            all_depths = d0[None]
        return jnp.moveaxis(all_depths, 0, 1)  # [B, NW, Tt, S, H, W]

    return jax.jit(process)


class SequenceProcessor:
    """Chunked whole-scene ESTM evaluation with static shapes.

    Scenes have arbitrary length but XLA programs need static shapes, so the
    scene is processed in chunks of `chunk` frames. Consecutive chunks
    overlap by lwindow-1 frames (the sliding window spans the boundary) and
    the ESTMemory FIFO is carried through, so the window sequence is
    IDENTICAL to frame-by-frame streaming. Only two programs ever compile:
    the first chunk (first window without EST fusion, reference flag
    hybrid_depth_decoder.py:423) and the continuation chunk (all windows
    fused). The tail is padded by repeating the last frame and the padded
    windows' outputs dropped.
    """

    def __init__(
        self,
        model: DepthNetHybrid,
        variables,
        lwindow: int = 3,
        memory_size: int = 2,
        chunk: int = 16,
        reference_pose_pairing: bool = False,
        output_scales: tuple = (0, 1, 2, 3),
        output_dtype=None,
    ):
        """output_scales / output_dtype: trim the per-chunk device->host
        transfer to the depth scales (and precision) the consumer actually
        reads — the fetch is a material cost through slow links."""
        assert chunk >= lwindow
        self.model = model
        self.variables = variables
        self.lwindow = lwindow
        self.memory_size = memory_size
        self.chunk = chunk
        # windows emitted per chunk / frame stride between chunk starts
        self.stride = chunk - (lwindow - 1)

        def window_step(variables, imgs, poses, intr, memory, use_est,
                        feats):
            outputs, (key, value, pose) = model.apply(
                variables, imgs, poses, intr,
                memory=memory if use_est else None,
                use_est=use_est, train=False, matching_feats=feats,
            )
            depth = trim_depth(
                outputs["depth"][:, 0], output_scales, output_dtype
            )
            return depth, memory.push(
                key, value, pose,
                reference_pose_pairing=reference_pose_pairing,
            )

        def chunk_fn(variables, frames, poses, intr, memory, feats_carry,
                     first):
            # frames: [B, chunk, H, W, 3]; feats_carry: matching features of
            # the lwindow-1 frames shared with the previous chunk (None on
            # the first). Each frame's features are computed exactly once,
            # in one batched encoder call per chunk.
            lw = lwindow
            b, ck, h_img, w_img, _ = frames.shape
            new_frames = frames if first else frames[:, lw - 1 :]
            nf = new_frames.shape[1]
            new_feats = model.apply(
                variables, new_frames.reshape(b * nf, h_img, w_img, 3),
                method="compute_matching",
            ).reshape(b, nf, h_img // 4, w_img // 4, -1)
            feats = (
                new_feats if first
                else jnp.concatenate([feats_carry, new_feats], 1)
            )

            d0, memory = window_step(
                variables, frames[:, :lw], poses[:, :lw], intr, memory,
                not first, feats[:, :lw],
            )

            def body(memory, start):
                iw = jax.lax.dynamic_slice_in_dim(frames, start, lw, 1)
                pw = jax.lax.dynamic_slice_in_dim(poses, start, lw, 1)
                fw = jax.lax.dynamic_slice_in_dim(feats, start, lw, 1)
                depth, memory = window_step(
                    variables, iw, pw, intr, memory, True, fw,
                )
                return memory, depth

            memory, rest = jax.lax.scan(
                body, memory, jnp.arange(1, self.stride)
            )
            depths = jnp.concatenate([d0[None], rest], axis=0)
            # carry the last lwindow-1 frames' features into the next chunk
            return (jnp.moveaxis(depths, 0, 1), memory,
                    feats[:, self.stride :])

        self._chunk_first = jax.jit(
            lambda v, f, p, k, m: chunk_fn(v, f, p, k, m, None, True),
            donate_argnums=(4,),
        )
        self._chunk_cont = jax.jit(
            lambda v, f, p, k, m, fc: chunk_fn(v, f, p, k, m, fc, False),
            donate_argnums=(4, 5),
        )

    def process_scene(
        self,
        frames: np.ndarray,   # [T, H, W, 3] float 0..255
        poses: np.ndarray,    # [T, 4, 4]
        intr: np.ndarray,     # [3, 3]
    ) -> np.ndarray:
        """Returns [T - lwindow + 1, 4, H, W] center-frame depths."""
        return self.process_scenes([(frames, poses, intr)])[0]

    def process_scenes(self, scenes) -> list:
        """Evaluate B INDEPENDENT scenes through one batched scan program.

        scenes: list of (frames [T_i, H, W, 3], poses [T_i, 4, 4],
        intr [3, 3]) tuples — lengths may differ; each scene's window
        chain (first-window no-EST flag, ESTMemory FIFO) is independent
        because the batch axis never mixes. Shorter scenes are padded to
        the longest by repeating their last frame and the padded windows'
        outputs dropped, so outputs are IDENTICAL to B separate
        process_scene runs (tests/test_sequence.py pins this).

        This is how a TPU beats the reference's one-scene-at-a-time
        offline loop (eval_hybrid_seq.py:124-193): the gather/conv work of
        B scenes shares each compiled launch. Returns a list of
        [T_i - lwindow + 1, S, H, W] arrays, one per scene.
        """
        b = len(scenes)
        lw = self.lwindow
        ts = [np.asarray(s[0]).shape[0] for s in scenes]
        for t in ts:
            if t < lw:
                raise ValueError(
                    f"scene has {t} frames but the sliding window needs "
                    f"at least {lw}"
                )
        t_max = max(ts)

        def pad_scene(x, t, keep_uint8=False):
            # uint8 frames stay uint8 through the chunk upload (1/4 the
            # host->device bytes); the model casts on device — exact
            x = np.asarray(x)
            if not (keep_uint8 and x.dtype == np.uint8):
                x = x.astype(np.float32, copy=False)
            if t == t_max:
                return x
            return np.concatenate(
                [x, np.repeat(x[-1:], t_max - t, axis=0)], axis=0
            )

        all_u8 = all(np.asarray(s[0]).dtype == np.uint8 for s in scenes)
        frames_b = np.stack(
            [pad_scene(s[0], t, keep_uint8=all_u8)
             for s, t in zip(scenes, ts)]
        )
        poses_b = np.stack([pad_scene(s[1], t) for s, t in zip(scenes, ts)])
        intr_d = jnp.asarray(
            np.stack([np.asarray(s[2], np.float32) for s in scenes])
        )
        h, w = frames_b.shape[2], frames_b.shape[3]
        n_windows = [t - lw + 1 for t in ts]
        max_windows = t_max - lw + 1

        memory = ESTMemory.create(
            b, self.memory_size, self.model.ndepths, h // 4, w // 4, 16,
            dtype=self.model.dtype or jnp.float32,
        )

        outs = [[] for _ in range(b)]
        emitted = 0
        start = 0
        feats = None
        pending = None  # previous chunk's device result, fetched one late:
        # the device->host transfer overlaps the next chunk's compute (the
        # same one-deep fetch pipeline as the streaming drivers)

        def consume(p):
            depths, base = p
            fetched = np.asarray(depths)
            for i in range(b):
                take = min(self.stride, max(n_windows[i] - base, 0))
                if take > 0:
                    outs[i].append(fetched[i, :take])

        while emitted < max_windows:
            end = start + self.chunk
            if end <= t_max:
                fr = frames_b[:, start:end]
                po = poses_b[:, start:end]
            else:  # pad the tail by repeating the last frame
                pad = end - t_max
                fr = np.concatenate(
                    [frames_b[:, start:],
                     np.repeat(frames_b[:, -1:], pad, axis=1)], 1
                )
                po = np.concatenate(
                    [poses_b[:, start:],
                     np.repeat(poses_b[:, -1:], pad, axis=1)], 1
                )
            fr = jnp.asarray(np.ascontiguousarray(fr))
            po = jnp.asarray(np.ascontiguousarray(po))
            if feats is None:
                depths, memory, feats = self._chunk_first(
                    self.variables, fr, po, intr_d, memory,
                )
            else:
                depths, memory, feats = self._chunk_cont(
                    self.variables, fr, po, intr_d, memory, feats,
                )
            if pending is not None:
                consume(pending)
            pending = (depths, emitted)
            emitted += self.stride
            start += self.stride
        consume(pending)
        return [np.concatenate(o, axis=0) for o in outs]
