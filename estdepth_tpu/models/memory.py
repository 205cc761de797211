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
        self, key: jnp.ndarray, value: jnp.ndarray, pose: jnp.ndarray
    ) -> "ESTMemory":
        """Append (key, value, pose) dropping the oldest entry.

        Mirrors the bounded deque in eval_hybrid_seq.py:190-193. Gradients are
        cut here (reference detaches state at hybrid_depth_decoder.py:215-216).
        """
        key = jax.lax.stop_gradient(key)
        value = jax.lax.stop_gradient(value)
        return ESTMemory(
            keys=jnp.concatenate([self.keys[:, 1:], key[:, None]], axis=1),
            values=jnp.concatenate([self.values[:, 1:], value[:, None]], axis=1),
            poses=jnp.concatenate([self.poses[:, 1:], pose[:, None]], axis=1),
            valid=jnp.concatenate(
                [self.valid[:, 1:], jnp.ones_like(self.valid[:, :1])], axis=1
            ),
        )
