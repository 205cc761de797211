"""ESTM streaming state: a fixed-shape FIFO of key/value cost volumes.

TPU-native replacement for the reference's Python deque of detached tensors
(/root/reference/eval_hybrid_seq.py:70,190-193 and the decoder state emission
at hybrid_depth_decoder.py:215-216,292): a static-shape pytree that lives in
HBM across frames, so the whole streaming step jits once and the memory
buffers can be donated.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class ESTMemory:
    """FIFO memory of M past key/value volumes (newest at slot M-1).

    Shapes:
      keys/values: [B, M, D, H, W, C]
      poses:       [B, M, 4, 4] cam-to-world
      valid:       [B, M] bool — False for not-yet-filled slots
    """

    keys: jnp.ndarray
    values: jnp.ndarray
    poses: jnp.ndarray
    valid: jnp.ndarray

    @property
    def size(self) -> int:
        return self.keys.shape[1]

    @classmethod
    def create(
        cls,
        batch: int,
        memory_size: int,
        ndepths: int,
        height: int,
        width: int,
        channels: int = 16,
        dtype=jnp.float32,
    ) -> "ESTMemory":
        shape = (batch, memory_size, ndepths, height, width, channels)
        return cls(
            keys=jnp.zeros(shape, dtype),
            values=jnp.zeros(shape, dtype),
            poses=jnp.tile(
                jnp.eye(4, dtype=jnp.float32)[None, None],
                (batch, memory_size, 1, 1),
            ),
            valid=jnp.zeros((batch, memory_size), jnp.bool_),
        )

    def push(
        self,
        key: jnp.ndarray,
        value: jnp.ndarray,
        pose: jnp.ndarray,
        reference_pose_pairing: bool = False,
    ) -> "ESTMemory":
        """Append (key, value, pose) dropping the oldest entry.

        Mirrors the bounded deque in eval_hybrid_seq.py:190-193. Gradients are
        cut here (reference detaches state at hybrid_depth_decoder.py:215-216).

        reference_pose_pairing: strict-parity mode reproducing the reference's
        pose bookkeeping. Its decoder returns `cam_poses[-1:]` AFTER extending
        the list with the previous memory's poses
        (hybrid_depth_decoder.py:221,292), so whenever memory is non-empty the
        pose stored next to the new K/V volume is the NEWEST EXISTING memory
        pose, not the volume's own camera pose — in steady state every memory
        entry keeps the first window's last-target pose for the whole scene.
        Default False pairs each volume with its own pose (geometrically
        correct; ARCHITECTURE.md deviation #1).
        """
        key = jax.lax.stop_gradient(key)
        value = jax.lax.stop_gradient(value)
        if reference_pose_pairing:
            newest_valid = self.valid[:, -1]
            pose = jnp.where(
                newest_valid[:, None, None], self.poses[:, -1], pose
            )
        return ESTMemory(
            keys=jnp.concatenate([self.keys[:, 1:], key[:, None]], axis=1),
            values=jnp.concatenate([self.values[:, 1:], value[:, None]], axis=1),
            poses=jnp.concatenate([self.poses[:, 1:], pose[:, None]], axis=1),
            valid=jnp.concatenate(
                [self.valid[:, 1:], jnp.ones_like(self.valid[:, :1])], axis=1
            ),
        )
