"""Host-side data loading: shuffled epoch iteration, fixed-shape batching, and
background prefetch feeding the device mesh.

Replaces the reference's torch DataLoader + Lightning DataModule
(ref scenerf/data/semantic_kitti/kitti_dm.py, bundlefusion_dm.py). The loader
is a plain thread-prefetched iterator: items are read + padded on the host
while the previous step runs on the TPU, and `shard_batch` places each global
batch on the data mesh.
"""
from __future__ import annotations

import queue
import threading
from typing import Callable, Dict, Iterator, List, Sequence

import numpy as np


class DataLoader:
    """Minimal epoch loader: dataset + collate -> fixed-shape numpy batches."""

    def __init__(
        self,
        dataset,
        collate_fn: Callable[[List[Dict]], Dict[str, np.ndarray]],
        batch_size: int = 1,
        shuffle: bool = False,
        drop_last: bool = True,
        limit_fraction: float = 1.0,
        prefetch: int = 2,
        seed: int = 42,
    ):
        self.dataset = dataset
        self.collate_fn = collate_fn
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.limit_fraction = limit_fraction
        self.prefetch = prefetch
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        n = int(len(self.dataset) * self.limit_fraction)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _index_order(self) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(idx)
        # limit_train_batches analog: half the train set per epoch
        # (ref train_kitti.py:135,149)
        n = int(len(idx) * self.limit_fraction)
        return idx[:n]

    def _produce(self, order: Sequence[int], out_q: queue.Queue):
        try:
            batch_items: List[Dict] = []
            for i in order:
                batch_items.append(self.dataset[int(i)])
                if len(batch_items) == self.batch_size:
                    out_q.put(self.collate_fn(batch_items))
                    batch_items = []
            if batch_items and not self.drop_last:
                out_q.put(self.collate_fn(batch_items))
        except Exception as e:  # surface worker errors to the consumer
            out_q.put(e)
        finally:
            out_q.put(None)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        order = self._index_order()
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        t = threading.Thread(target=self._produce, args=(order, q), daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is None:
                break
            if isinstance(item, Exception):
                raise item
            yield item
