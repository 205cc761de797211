"""Host input pipeline: shuffling, batching, background prefetch.

Replaces the reference's torch DataLoader + DistributedSampler
(/root/reference/train_hybrid.py:376-400): per-host shard selection
(jax.process_index slices the sample space, the SPMD equivalent of
DistributedSampler), epoch-seeded shuffling (sampler.set_epoch,
train_hybrid.py:87-89), and a background thread pool that overlaps decode
with TPU step time.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator

import numpy as np


def collate(samples) -> Dict[str, np.ndarray]:
    """Stack a list of dict samples along a new leading batch axis."""
    keys = samples[0].keys()
    return {k: np.stack([s[k] for s in samples]) for k in keys}


class TrainLoader:
    """Shuffled, sharded, prefetched batch iterator over a map-style dataset."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        shard_index: int = 0,
        num_shards: int = 1,
        num_workers: int = 4,
        prefetch: int = 2,
        seed: int = 0,
        drop_last: bool = True,
    ):
        assert drop_last, "static TPU shapes require drop_last"
        self.dataset = dataset
        self.batch_size = batch_size
        self.shard_index = shard_index
        self.num_shards = num_shards
        self.num_workers = num_workers
        self.prefetch = prefetch
        self.seed = seed

    def steps_per_epoch(self) -> int:
        # matches epoch(): shards are padded up to equal length
        per_shard = -(-len(self.dataset) // self.num_shards)
        return per_shard // self.batch_size

    def epoch(self, epoch: int) -> Iterator[Dict[str, np.ndarray]]:
        """Deterministic per-epoch shuffle shared by all hosts, then shard
        (the DistributedSampler pattern)."""
        rng = np.random.default_rng(self.seed + epoch)
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(epoch)  # fresh retry draws per epoch
        order = rng.permutation(len(self.dataset))
        # pad to a multiple of num_shards by repeating the head (torch
        # DistributedSampler's padding): every shard yields the SAME number
        # of batches, so no host dispatches an extra shard_map step whose
        # collectives the others never enter (multi-host hang otherwise)
        if len(order) % self.num_shards:
            pad = self.num_shards - len(order) % self.num_shards
            order = np.concatenate([order, order[:pad]])
        shard = order[self.shard_index :: self.num_shards]
        n_batches = len(shard) // self.batch_size
        batches = [
            shard[i * self.batch_size : (i + 1) * self.batch_size]
            for i in range(n_batches)
        ]

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def produce():
            # exceptions must reach the consumer: a producer that dies
            # silently leaves the main thread blocked on q.get() forever
            def put(item) -> bool:
                # a plain q.put blocks forever on a full queue if the
                # consumer abandoned the iterator; poll the stop event so
                # the thread (and its worker pool) can exit
                while not stop.is_set():
                    try:
                        q.put(item, timeout=0.2)
                        return True
                    except queue.Full:
                        continue
                return False

            try:
                with ThreadPoolExecutor(max(self.num_workers, 1)) as pool:
                    for batch_ids in batches:
                        if stop.is_set():
                            return
                        samples = list(
                            pool.map(self.dataset.__getitem__, batch_ids)
                        )
                        if not put(collate(samples)):
                            return
                put(None)
            except BaseException as e:  # noqa: BLE001
                put(e)

        thread = threading.Thread(target=produce, daemon=True)
        thread.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()


def prefetch_to_device(iterator, mesh=None, size: int = 2):
    """Overlap host->device transfer with compute. With a mesh, batches are
    sharded over the `data` axis."""
    import jax

    from estdepth_tpu.parallel.mesh import shard_batch

    buf = []
    for batch in iterator:
        if mesh is not None:
            batch = shard_batch(batch, mesh)
        else:
            batch = jax.tree.map(jax.device_put, batch)
        buf.append(batch)
        if len(buf) >= size:
            yield buf.pop(0)
    while buf:
        yield buf.pop(0)
