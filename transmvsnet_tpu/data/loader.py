"""Host-sharded batching loader — the DistributedSampler + DataLoader analog.

Replicates the reference's per-process data sharding contract
(reference train.py:377-384): every host/replica sees a disjoint,
epoch-shuffled slice of the sample index space, padded by wrapping so all
shards have equal length. Samples are built by worker threads and batched
into stacked NumPy pytrees ready for device_put.
"""

from __future__ import annotations

import concurrent.futures
import queue
import threading
from typing import Any, Iterator

import numpy as np


def _stack_samples(samples: list[dict[str, Any]]) -> dict[str, Any]:
    out: dict[str, Any] = {}
    first = samples[0]
    for key, value in first.items():
        if isinstance(value, dict):
            out[key] = _stack_samples([s[key] for s in samples])
        elif isinstance(value, str):
            out[key] = [s[key] for s in samples]  # metadata stays a list
        elif isinstance(value, np.ndarray) or np.isscalar(value):
            out[key] = np.stack([np.asarray(s[key]) for s in samples])
        else:
            out[key] = [s[key] for s in samples]
    return out


class ShardedLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        num_shards: int = 1,
        shard_id: int = 0,
        seed: int = 0,
        drop_last: bool = False,
        num_workers: int = 4,
        prefetch: int = 2,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_shards = num_shards
        self.shard_id = shard_id
        self.seed = seed
        self.drop_last = drop_last
        self.num_workers = num_workers
        self.prefetch = prefetch
        self._epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self._epoch = epoch

    def _shard_indices(self) -> np.ndarray:
        n = len(self.dataset)
        indices = np.arange(n)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self._epoch)
            rng.shuffle(indices)
        # Pad by wrapping so every shard has equal length (the
        # DistributedSampler contract).
        per_shard = -(-n // self.num_shards)
        total = per_shard * self.num_shards
        if total > n:
            indices = np.concatenate([indices, indices[: total - n]])
        return indices[self.shard_id :: self.num_shards]

    def __len__(self) -> int:
        per_shard = -(-len(self.dataset) // self.num_shards)
        if self.drop_last:
            return per_shard // self.batch_size
        return -(-per_shard // self.batch_size)

    def __iter__(self) -> Iterator[dict[str, Any]]:
        indices = self._shard_indices()
        nb = len(self)
        batches = [
            indices[i * self.batch_size : (i + 1) * self.batch_size]
            for i in range(nb)
        ]
        if self.num_workers <= 0:
            for batch_idx in batches:
                yield _stack_samples([self.dataset[int(i)] for i in batch_idx])
            return

        def build(batch_idx):
            return _stack_samples([self.dataset[int(i)] for i in batch_idx])

        with concurrent.futures.ThreadPoolExecutor(self.num_workers) as pool:
            pending: queue.Queue = queue.Queue()
            it = iter(batches)
            for _ in range(min(self.prefetch + 1, nb)):
                pending.put(pool.submit(build, next(it)))
            served = 0
            while served < nb:
                fut = pending.get()
                yield fut.result()
                served += 1
                try:
                    pending.put(pool.submit(build, next(it)))
                except StopIteration:
                    pass
