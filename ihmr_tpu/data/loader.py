"""Batched, process-sharded data loading with background prefetch.

Replaces the reference's torch DataLoader + DistributedSampler
(ref src/data/data_loader.py): each process iterates its own stride of the
index space (rank::world_size, the DistributedSampler contract), samples are
collated into numpy batches, and a small thread pool overlaps host decode
with device compute. A native C++ decode path plugs in via
ihmr_tpu.native when built.
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, List

import numpy as np


def collate(samples: List[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    keys = samples[0].keys()
    return {k: np.stack([s[k] for s in samples]) for k in keys}


class BatchLoader:
    """Iterates dataset batches for one process of a DP group.

    drop_last is train-only (ref data_loader.py:21,44); eval datasets are
    pre-padded to divisibility so nothing is dropped there.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        rank: int = 0,
        world_size: int = 1,
        shuffle: bool = False,
        drop_last: bool = False,
        prefetch: int = 2,
        seed: int = 0,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.rank = max(rank, 0)
        self.world_size = max(world_size, 1)
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.prefetch = prefetch
        self._epoch = 0
        self._seed = seed

    def __len__(self) -> int:
        n = len(self.dataset) // self.world_size
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def set_epoch(self, epoch: int):
        self._epoch = epoch

    def _indices(self) -> np.ndarray:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.RandomState(self._seed + self._epoch)
            rng.shuffle(order)
        # DistributedSampler contract: pad to a multiple of world_size, stride
        pad = (-n) % self.world_size
        if pad:
            order = np.concatenate([order, order[:pad]])
        return order[self.rank :: self.world_size]

    def _batches(self) -> Iterator[np.ndarray]:
        idxs = self._indices()
        for start in range(0, len(idxs), self.batch_size):
            chunk = idxs[start : start + self.batch_size]
            if self.drop_last and len(chunk) < self.batch_size:
                return
            yield chunk

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        if self.prefetch <= 0:
            for chunk in self._batches():
                yield collate([self.dataset[int(i)] for i in chunk])
            return

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        SENTINEL = object()

        def worker():
            try:
                for chunk in self._batches():
                    q.put(collate([self.dataset[int(i)] for i in chunk]))
            finally:
                q.put(SENTINEL)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is SENTINEL:
                break
            yield item
        t.join()
