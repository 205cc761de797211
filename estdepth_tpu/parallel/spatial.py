"""Spatially-sharded (width-partitioned) inference over the device mesh.

A beyond-reference capability (the reference's only parallelism is DDP data
parallel, SURVEY.md §2.3): for LATENCY scaling of a single stream, shard the
image WIDTH across the mesh and let XLA GSPMD partition the whole network —
convolutions get halo exchanges, the plane-sweep / frustum warp gathers get
collective permutes, normalizations and softargmin reductions stay local
(eval-mode BN uses running stats; GroupNorm reduces over the sharded axis
via psum inserted by GSPMD). Numerics are identical to single-device
inference (tests/test_spatial_shard.py).

Width is the natural shard axis here: every hot tensor (images [B,V,H,W,3],
cost volumes [B,T,D,H/4,W/4,C], K/V memory volumes) carries it, and the
flagship W=320 divides by typical mesh sizes (v5e hosts: 4 or 8 chips).
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from estdepth_tpu.models import DepthNetHybrid, ESTMemory


def make_spatial_window_fn(
    model: DepthNetHybrid,
    mesh: Mesh,
    axis_name: str = "data",
    with_memory: bool = False,
):
    """Returns jitted fn(variables, imgs, poses, intr[, memory]) with the
    width axis of every image/volume input sharded over `axis_name` and the
    parameters replicated.

    imgs: [B, V, H, W, 3]; memory K/V: [B, M, D, H/4, W/4, C]. Outputs
    keep their width axis sharded; fetch or re-shard as needed.
    """
    repl = NamedSharding(mesh, P())
    img_s = NamedSharding(mesh, P(None, None, None, axis_name, None))
    vol_s = NamedSharding(mesh, P(None, None, None, None, axis_name, None))
    mem_s = ESTMemory(keys=vol_s, values=vol_s, poses=repl, valid=repl)

    def fn(variables, imgs, poses, intr, memory: Optional[ESTMemory] = None):
        outputs, state = model.apply(
            variables, imgs, poses, intr, memory=memory,
            use_est=memory is not None, train=False,
        )
        return outputs, state

    in_shardings = (repl, img_s, repl, repl) + (
        (mem_s,) if with_memory else ()
    )
    return jax.jit(fn, in_shardings=in_shardings)
