"""ESTM streaming inference: O(1)-memory per-frame depth for long videos.

Behavioral equivalent of the eval_hybrid_seq.py driver
(/root/reference/eval_hybrid_seq.py:124-261): a sliding local window of
`lwindow` frames plus a FIFO memory of `memory_size` detached key/value cost
volumes. Each arriving frame (once the window is full) produces the depth of
the window's center frame.

TPU-native design (this is the latency-critical path, SURVEY.md §3.3):
  * the whole per-frame step is ONE jitted function with the ESTMemory
    buffers donated, so state never leaves HBM between frames;
  * window frames stay resident on device — each arriving frame costs one
    256KB async host->device transfer, not a re-upload of the window
    (measured ~11x end-to-end over a host-staged driver on identical
    hardware);
  * two jit specializations mirror the reference's flag
    (hybrid_depth_decoder.py:423): first window of a scene without EST
    fusion, later windows with it.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from estdepth_tpu.eval.output import trim_depth
from estdepth_tpu.models import DepthNetHybrid, ESTMemory


class ESTMRunner:
    """Host-side streaming driver around the jitted window step.

    Throughput note: push_frame dispatches asynchronously and returns a
    device array — the caller chooses the fetch discipline. Reading each
    result immediately is the zero-added-latency protocol; holding frame
    t's result and reading it only after pushing frame t+1 overlaps the
    device->host transfer with the next step's compute (measured ~2x
    streaming throughput, bench.py streaming_pipelined_fps; the
    tools/eval_estm.py scene loop uses this one-frame-deep pipeline)."""

    def __init__(
        self,
        model: DepthNetHybrid,
        variables,
        height: int,
        width: int,
        lwindow: int = 3,
        memory_size: int = 2,
        batch: int = 1,
        freeze_weights: bool = False,
        reference_pose_pairing: bool = False,
        output_scales: tuple = (0, 1, 2, 3),
        output_dtype=None,
        return_probs: bool = False,
    ):
        """freeze_weights: close the (eval-constant) variables pytree over
        the jitted step instead of passing its leaves per call. Cuts
        per-frame dispatch cost but embeds the weights as HLO constants,
        which inflates XLA compile time badly for the full-size model —
        default off; useful for small models / long streams.

        reference_pose_pairing: reproduce the reference's stale memory-pose
        bookkeeping bit-for-bit (see ESTMemory.push) — used by the parity
        harness; keep False for geometrically correct streaming.

        output_scales / output_dtype: serving knobs — return only the
        needed depth scales (e.g. (0,) for the refined map) and optionally
        downcast (e.g. bfloat16). The per-frame device->host fetch is a
        material part of streaming latency (bench.py measures ~80 ms/frame
        dispatch+fetch overhead); scale-0-only bf16 is 8x less transfer
        than the default 4-scale fp32."""
        self.model = model
        self.variables = variables
        self.lwindow = lwindow
        self.memory_size = memory_size
        self.batch = batch
        self.height = height
        self.width = width
        self._window_imgs = []   # device arrays [B, H, W, 3]
        self._window_poses = []  # host [B, 4, 4]
        self._intr_dev = None
        self._memory_filled = False
        self._feats = None  # carried matching features of shared frames
        self.memory = self._fresh_memory()

        frozen = (
            jax.tree.map(jax.device_put, variables) if freeze_weights else None
        )

        def step(variables, frames, poses, intr, memory, use_est,
                 feats=None):
            # frames: tuple of lwindow [B, H, W, 3] device arrays (one
            # per stream for batch > 1 — independent streams batched into
            # one step).
            # feats: [B, lwindow-1, H/4, W/4, C] matching features of the
            # lwindow-1 frames shared with the previous window. Eval-mode
            # BN makes per-frame features deterministic, so carrying them
            # is EXACT — the matching encoder runs on only the NEW frame
            # in steady state instead of the whole window.
            imgs = jnp.stack(frames, axis=1)  # [B, lw, H, W, 3]
            poses_b = jnp.stack(poses, axis=1)  # [B, lw, 4, 4]
            b, lw, h_img, w_img, _ = imgs.shape
            if feats is None:  # first window: all frames
                all_feats = model.apply(
                    variables, imgs.reshape(b * lw, h_img, w_img, 3),
                    method="compute_matching",
                ).reshape(b, lw, h_img // 4, w_img // 4, -1)
            else:
                new_feat = model.apply(
                    variables, imgs[:, -1], method="compute_matching",
                )
                all_feats = jnp.concatenate([feats, new_feat[:, None]], 1)
            outputs, (key, value, pose) = model.apply(
                variables, imgs, poses_b, intr,
                memory=memory if use_est else None,
                use_est=use_est, train=False, matching_feats=all_feats,
            )
            new_memory = memory.push(
                key, value, pose,
                reference_pose_pairing=reference_pose_pairing,
            )
            # center-frame depth (eval_hybrid_seq.py:200-258 saves
            # ("depth",0,0) refined and ("depth",0,2) fused-head maps);
            # output_scales/output_dtype trim the per-frame fetch
            depth = trim_depth(
                outputs["depth"][:, 0], output_scales, output_dtype
            )
            if return_probs:
                probs = jnp.stack(
                    [outputs["init_prob"][:, 0], outputs["fused_prob"][:, 0]],
                    axis=1,
                )  # [B, 2, H, W]
                return (depth, probs), new_memory, all_feats[:, 1:]
            return depth, new_memory, all_feats[:, 1:]

        if freeze_weights:
            self._step = jax.jit(
                lambda frames, poses, intr, memory, use_est, feats=None: step(
                    frozen, frames, poses, intr, memory, use_est, feats
                ),
                static_argnames=("use_est",),
                donate_argnames=("memory", "feats"),
            )
            self._pass_variables = False
        else:
            self._step = jax.jit(
                step, static_argnames=("use_est",),
                donate_argnames=("memory", "feats"),
            )
            self._pass_variables = True

    def _fresh_memory(self) -> ESTMemory:
        # K/V volumes are produced in the model dtype; storing the FIFO in
        # the same dtype keeps push() promotion-free and halves the donated
        # state for bf16 models.
        return ESTMemory.create(
            self.batch, self.memory_size, self.model.ndepths,
            self.height // 4, self.width // 4, 16,
            dtype=self.model.dtype or jnp.float32,
        )

    def reset(self):
        """New scene: clear window + memory (eval_hybrid_seq.py:163-167)."""
        self._window_imgs.clear()
        self._window_poses.clear()
        self.memory = self._fresh_memory()
        self._memory_filled = False
        self._feats = None
        # the next scene may carry different intrinsics — re-upload on the
        # first push_frame instead of reusing the previous scene's K
        self._intr_dev = None

    def push_frame(
        self, img: np.ndarray, pose: np.ndarray, intr: np.ndarray
    ) -> Optional[jnp.ndarray]:
        """Feed one frame per stream; returns [B, S, H, W] center-frame
        depth (S = len(output_scales)) once the window is full, else None.

        img may be [H, W, 3] (replicated to every stream when batch > 1)
        or [B, H, W, 3] with one DISTINCT frame per stream; pose likewise
        [4, 4] or [B, 4, 4].

        uint8 frames are uploaded AS uint8 (1/4 the host->device bytes —
        the per-frame upload is a material streaming cost on slow links)
        and cast on device; results are bit-identical to float32 input.
        Keep the dtype consistent within a scene (a dtype switch is one
        extra jit specialization, not an error)."""
        img = np.asarray(img)
        if img.dtype != np.uint8:
            img = img.astype(np.float32, copy=False)
        if img.ndim == 3:
            img = np.broadcast_to(img[None], (self.batch,) + img.shape)
        pose = np.asarray(pose, np.float32)
        if pose.ndim == 2:
            pose = np.broadcast_to(pose[None], (self.batch, 4, 4))
        # async upload of the ONE new frame; everything else is resident
        self._window_imgs.append(jax.device_put(np.ascontiguousarray(img)))
        self._window_poses.append(np.ascontiguousarray(pose))
        if len(self._window_imgs) < self.lwindow:
            return None

        if self._intr_dev is None:
            k = np.asarray(intr, np.float32)
            k = k[None] if k.ndim == 2 else k
            if k.shape[0] != self.batch:
                k = np.tile(k[:1], (self.batch, 1, 1))
            self._intr_dev = jax.device_put(k)

        poses = tuple(self._window_poses)  # lw x [B, 4, 4] tiny transfers
        args = (tuple(self._window_imgs), poses, self._intr_dev, self.memory)
        if self._pass_variables:
            args = (self.variables,) + args
        depth, self.memory, self._feats = self._step(
            *args, use_est=self._memory_filled, feats=self._feats,
        )
        self._memory_filled = True
        # slide the window by one (eval_hybrid_seq.py:190)
        self._window_imgs.pop(0)
        self._window_poses.pop(0)
        return depth
