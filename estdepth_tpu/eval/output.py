"""Shared output-trimming for the eval drivers.

Every driver (ESTMRunner, make_sequence_processor, SequenceProcessor)
offers the same two serving knobs: fetch only the depth scales the
consumer reads, optionally downcast — the per-step device->host transfer
is a material cost (bench.py measures ~2x streaming throughput from
trimming + pipelining the fetch).
"""

from __future__ import annotations

import jax.numpy as jnp

FULL_SCALES = (0, 1, 2, 3)


def trim_depth(depth: jnp.ndarray, output_scales, output_dtype):
    """depth [B, 4, H, W] -> [B, len(output_scales), H, W] (+ cast)."""
    if tuple(output_scales) != FULL_SCALES:
        depth = depth[:, jnp.array(output_scales)]
    if output_dtype is not None:
        depth = depth.astype(output_dtype)
    return depth
