"""ESTM streaming inference: O(1)-memory per-frame depth for long videos.

Behavioral equivalent of the eval_hybrid_seq.py driver
(/root/reference/eval_hybrid_seq.py:124-261): a sliding local window of
`lwindow` frames plus a FIFO memory of `memory_size` detached key/value cost
volumes. Each arriving frame (once the window is full) produces the depth of
the window's center frame.

TPU-native design: the whole per-frame step is ONE jitted function with the
ESTMemory buffers donated, so state never leaves HBM between frames
(SURVEY.md §5.7). Two specializations exist, mirroring the reference's flag
(hybrid_depth_decoder.py:423): the first window of a scene runs without EST
fusion (empty memory), later windows with it.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from estdepth_tpu.models import DepthNetHybrid, ESTMemory


class ESTMRunner:
    """Host-side streaming driver around the jitted window step."""

    def __init__(
        self,
        model: DepthNetHybrid,
        variables,
        height: int,
        width: int,
        lwindow: int = 3,
        memory_size: int = 2,
        batch: int = 1,
    ):
        self.model = model
        self.variables = variables
        self.lwindow = lwindow
        self.memory_size = memory_size
        self.batch = batch
        self.height = height
        self.width = width
        self._window_imgs = []
        self._window_poses = []
        self.memory = self._fresh_memory()

        def step(variables, imgs, poses, intr, memory, use_est):
            outputs, (key, value, pose) = model.apply(
                variables, imgs, poses, intr,
                memory=memory if use_est else None,
                use_est=use_est, train=False,
            )
            new_memory = memory.push(key, value, pose)
            # center-frame refined + init depth (eval_hybrid_seq.py:200-258
            # saves ("depth",0,0) and ("depth",0,2))
            return outputs["depth"][:, 0], new_memory

        self._step = jax.jit(
            step, static_argnames=("use_est",), donate_argnames=("memory",)
        )

    def _fresh_memory(self) -> ESTMemory:
        return ESTMemory.create(
            self.batch, self.memory_size, self.model.ndepths,
            self.height // 4, self.width // 4, 16,
        )

    def reset(self):
        """New scene: clear window + memory (eval_hybrid_seq.py:163-167)."""
        self._window_imgs.clear()
        self._window_poses.clear()
        self.memory = self._fresh_memory()
        self._memory_filled = False

    _memory_filled = False

    def push_frame(
        self, img: np.ndarray, pose: np.ndarray, intr: np.ndarray
    ) -> Optional[jnp.ndarray]:
        """Feed one frame; returns [B, 4, H, W] center-frame depth (4 scales,
        scale s at index s) once the window is full, else None."""
        self._window_imgs.append(np.asarray(img))
        self._window_poses.append(np.asarray(pose))
        if len(self._window_imgs) < self.lwindow:
            return None

        imgs = jnp.asarray(np.stack(self._window_imgs)[None])
        poses = jnp.asarray(np.stack(self._window_poses)[None])
        if self.batch > 1:
            imgs = jnp.tile(imgs, (self.batch, 1, 1, 1, 1))
            poses = jnp.tile(poses, (self.batch, 1, 1, 1))
        intr = jnp.asarray(intr[None] if intr.ndim == 2 else intr)
        if intr.shape[0] != self.batch:
            intr = jnp.tile(intr[:1], (self.batch, 1, 1))

        depth, self.memory = self._step(
            self.variables, imgs, poses, intr, self.memory,
            use_est=self._memory_filled,
        )
        self._memory_filled = True
        # slide the window by one (eval_hybrid_seq.py:190)
        self._window_imgs.pop(0)
        self._window_poses.pop(0)
        return depth
