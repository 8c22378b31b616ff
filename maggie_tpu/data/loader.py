"""Host data loader: per-process sharding, batching, background prefetch.

Replaces torch DataLoader + DistributedSampler (reference ``engine/train.py:123-138``,
``engine/test.py:303-309``): each JAX process takes a strided shard of the index
space; a daemon thread keeps a small prefetch queue warm so host decode overlaps
device compute.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator

import numpy as np


def _collate(samples: list[dict]) -> dict:
    out = {}
    for k in samples[0]:
        vals = [s[k] for s in samples]
        if type(vals[0]).__module__.split(".")[0] in ("jax", "jaxlib"):
            # device-preprocessed tensors: stack on device, no host round-trip
            import jax.numpy as jnp
            out[k] = jnp.stack(vals, axis=0)
        elif isinstance(vals[0], np.ndarray):
            out[k] = np.stack(vals, axis=0)
        elif isinstance(vals[0], (int, float)):
            out[k] = np.asarray(vals)
        elif (isinstance(vals[0], list) and vals[0]
              and isinstance(vals[0][0], str)):
            # torch default_collate turns a list of string-lists into a list over
            # the inner index of per-batch tuples; engine code indexes that way
            out[k] = [tuple(v) for v in zip(*vals)]
        else:
            out[k] = vals  # transform_info etc: batch-major list
    return out


class DataLoader:
    def __init__(self, dataset, batch_size: int = 1, shuffle: bool = False,
                 drop_last: bool = False, seed: int = 0,
                 num_shards: int = 1, shard_index: int = 0,
                 prefetch: int = 2, infinite: bool = False):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.rng = np.random.RandomState(seed)
        self.num_shards = num_shards
        self.shard_index = shard_index
        self.prefetch = prefetch
        self.infinite = infinite
        self.epoch = 0

    def _indices(self) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(idx)
        return idx[self.shard_index::self.num_shards]

    def __len__(self) -> int:
        n = len(self._indices()) if not self.shuffle else (len(self.dataset) + self.num_shards - 1) // self.num_shards
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _epoch_batches(self) -> Iterator[dict]:
        idx = self._indices()
        for i in range(0, len(idx), self.batch_size):
            chunk = idx[i:i + self.batch_size]
            if self.drop_last and len(chunk) < self.batch_size:
                return
            yield _collate([self.dataset[int(j)] for j in chunk])

    def _produce(self, q: queue.Queue):
        try:
            while True:
                for b in self._epoch_batches():
                    q.put(b)
                if not self.infinite:
                    break
                self.epoch += 1
        finally:
            q.put(None)

    def __iter__(self) -> Iterator[dict]:
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        t = threading.Thread(target=self._produce, args=(q,), daemon=True)
        t.start()
        while True:
            b = q.get()
            if b is None:
                return
            yield b
