"""Batching loader with background prefetch.

The reference leans on torch DataLoader worker processes for CPU-side
tokenization (reference `mdgen/train.py:32-43`); since tokenization moved
on-device, the host side is just memmap window reads + ``np.stack``, which a
single prefetch thread overlaps with TPU compute.
"""
from __future__ import annotations

import queue
import threading

import numpy as np

_STACK_KEYS = ("atom14", "seqres", "mask")


class Loader:
    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 drop_last: bool = True, seed: int = 0, prefetch: int = 2,
                 max_batches=None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.rng = np.random.default_rng(seed)
        self.prefetch = prefetch
        self.max_batches = max_batches

    def __len__(self):
        n = len(self.dataset) // self.batch_size
        if not self.drop_last and len(self.dataset) % self.batch_size:
            n += 1
        if self.max_batches is not None:
            n = min(n, self.max_batches)
        return n

    def _batches(self):
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(order)
        nb = len(self)
        for b in range(nb):
            idxs = order[b * self.batch_size : (b + 1) * self.batch_size]
            items = [self.dataset[int(i)] for i in idxs]
            batch = {
                k: np.stack([it[k] for it in items]) for k in _STACK_KEYS
            }
            batch["name"] = [it["name"] for it in items]
            yield batch

    def __iter__(self):
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        DONE = object()

        def worker():
            try:
                for batch in self._batches():
                    q.put(batch)
            finally:
                q.put(DONE)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is DONE:
                break
            yield item
