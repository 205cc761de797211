"""Device mesh + sharding helpers.

TPU-native replacement for the reference's torch.distributed/NCCL process
groups (/root/reference/train_hybrid.py:256-261, utils/utils.py:161-201):
a 1-D `data` mesh over which the train step runs SPMD. Gradient allreduce
(DDP backward, train_hybrid.py:180) becomes lax.pmean over ICI; apex sync-BN
(train_hybrid.py:291-295) becomes BatchNorm(axis_name="data"); scalar
reduction to rank 0 (utils/utils.py:183-201) becomes a pmean — every shard
holds the reduced value, no rank gating needed.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    n_devices: Optional[int] = None, devices: Optional[Sequence] = None
) -> Mesh:
    """1-D data-parallel mesh over the first n devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), axis_names=("data",))


def shard_batch(batch, mesh: Mesh):
    """Place a host batch with leading batch axis sharded over `data`.

    Single-process: the batch is the global batch; device_put scatters it.
    Multi-process: the batch is this PROCESS'S shard (the loader is already
    sharded by jax.process_index) — assemble the global array from the
    process-local data. The global batch size is local_batch x
    process_count."""
    sharding = NamedSharding(mesh, P("data"))
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)
            ),
            batch,
        )
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
