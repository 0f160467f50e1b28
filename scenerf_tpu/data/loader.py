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
        process_index: int = 0,
        process_count: int = 1,
    ):
        """process_index/process_count: multi-host input sharding. All
        processes build the SAME shuffled global order (same seed), then each
        yields only its contiguous batch_size/process_count slice of every
        global batch -- the local shard `parallel.mesh.shard_batch_multihost`
        assembles into the global array. `batch_size` is the GLOBAL batch."""
        if batch_size % process_count != 0:
            raise ValueError(f"global batch {batch_size} not divisible by "
                             f"process_count {process_count}")
        self.dataset = dataset
        self.collate_fn = collate_fn
        self.batch_size = batch_size
        self.local_batch_size = batch_size // process_count
        self.process_index = process_index
        self.process_count = process_count
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.limit_fraction = limit_fraction
        self.prefetch = prefetch
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        n = int(len(self.dataset) * self.limit_fraction)
        if self.drop_last or self.process_count > 1:
            # multi-process always drops the trailing partial batch
            # (per-process shard shapes must agree globally, see _index_order)
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _index_order(self) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(idx)
        # limit_train_batches analog: half the train set per epoch
        # (ref train_kitti.py:135,149)
        n = int(len(idx) * self.limit_fraction)
        idx = idx[:n]
        if self.process_count > 1:
            # keep only this process's slice of each global batch
            n_full = len(idx) // self.batch_size
            full = idx[:n_full * self.batch_size].reshape(
                n_full, self.process_count, self.local_batch_size)
            idx = full[:, self.process_index].reshape(-1)
            # (any trailing partial batch is dropped under multi-process:
            #  per-process shard shapes must agree globally)
        return idx

    def _produce(self, order: Sequence[int], out_q: queue.Queue):
        try:
            per_batch = self.local_batch_size
            batch_items: List[Dict] = []
            for i in order:
                batch_items.append(self.dataset[int(i)])
                if len(batch_items) == per_batch:
                    out_q.put(self.collate_fn(batch_items))
                    batch_items = []
            if batch_items and not self.drop_last and self.process_count == 1:
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
