"""Packed, double-buffered host->device infeed for the train loop.

The reference overlaps H2D with compute via torch DataLoader ``pin_memory``
+ cuda streams (``maggie/engine/train.py:211-233``). The TPU-native analogue:
a background thread packs each host batch's train tensors into ONE contiguous
f32 buffer and issues a single async ``jax.device_put`` — one transfer pays the
link's fixed latency once per batch instead of once per tensor, and the
double-buffer depth lets the transfer ride under the previous step's compute.
On-device unpacking is a single jitted slice/reshape call (no extra traffic;
XLA fuses the slices into the consumers).

Measured on the v5e tunnel (~150 ms fixed latency + ~160 MB/s): per-leaf puts
cost ~1.2 s per bs4 batch; packed + prefetched, the transfer fully hides under
the 0.54 s train step.
"""

from __future__ import annotations

import functools
import queue
import threading
from typing import Iterator

import numpy as np

TRAIN_KEYS = ("image", "mask", "alpha", "transition")


@functools.lru_cache(maxsize=8)
def _unpack_fn(spec: tuple):
    """spec: tuple of (key, shape) pairs; returns jitted buf -> dict."""
    import jax
    import jax.numpy as jnp

    def unpack(buf):
        out, off = {}, 0
        for key, shape in spec:
            n = int(np.prod(shape))
            out[key] = jax.lax.slice(buf, (off,), (off + n,)).reshape(shape)
            off += n
        return out

    return jax.jit(unpack)


def _pack(batch: dict) -> tuple[np.ndarray, tuple]:
    keys = [k for k in TRAIN_KEYS if k in batch]
    spec = tuple((k, tuple(batch[k].shape)) for k in keys)
    flat = [np.ascontiguousarray(batch[k], dtype=np.float32).ravel() for k in keys]
    return np.concatenate(flat), spec


_SENTINEL = object()


class DeviceInfeed:
    """Iterator of (host_batch, device_batch) with packed async transfer.

    When ``mesh`` is given, falls back to the per-leaf sharded put
    (multi-device layouts shard the batch dim; a packed 1-D buffer cannot).

    ``close()`` stops the producer thread and releases the prefetched
    host+device buffers; the train loop calls it in a ``finally`` so an
    aborted run (fault injection, KeyboardInterrupt) does not leave a thread
    decoding forever nor keep ``depth`` device batches pinned in HBM. After
    the underlying iterator raises, the error is re-raised on every
    subsequent ``next()`` instead of deadlocking on an empty queue.
    """

    def __init__(self, host_iter: Iterator[dict], mesh=None, depth: int = 2):
        self.host_iter = host_iter
        self.mesh = mesh
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self._final: BaseException | None = None
        self._done = False
        self._thread = threading.Thread(target=self._produce, daemon=True)
        self._thread.start()

    def _put(self, batch: dict):
        import jax

        if self.mesh is not None:
            import jax.numpy as jnp

            from ..parallel import shard_batch
            b = {k: jnp.asarray(v) for k, v in batch.items() if k in TRAIN_KEYS}
            return ("leaf", shard_batch(b, self.mesh), None)
        buf, spec = _pack(batch)
        return ("packed", jax.device_put(buf), spec)

    def _produce(self):
        try:
            for batch in self.host_iter:
                if self._stop.is_set():
                    return
                self._enqueue((batch, self._put(batch)))
                if self._stop.is_set():
                    return
            self._enqueue(_SENTINEL)
        except BaseException as exc:  # surface loader errors to the consumer
            self._enqueue(exc)

    def _enqueue(self, item):
        # bounded put that aborts on close() instead of blocking forever
        while not self._stop.is_set():
            try:
                self._q.put(item, timeout=0.2)
                return
            except queue.Full:
                continue

    def close(self):
        """Stop the producer and drop prefetched batches. Idempotent."""
        self._stop.set()
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
        self._thread.join(timeout=10.0)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __iter__(self):
        return self

    def __next__(self):
        if self._done:
            if self._final is not None:
                raise self._final
            raise StopIteration
        item = self._q.get()
        if item is _SENTINEL:
            self._done = True
            raise StopIteration
        if isinstance(item, BaseException):
            self._done = True
            self._final = item
            raise item
        batch, (kind, dev, spec) = item
        if kind == "leaf":
            return batch, dev
        return batch, _unpack_fn(spec)(dev)
