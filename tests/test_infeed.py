"""Unit tests for the packed double-buffered device infeed (engine/infeed.py)."""

import numpy as np
import pytest


def _batches(n, seed=0):
    rs = np.random.RandomState(seed)
    for i in range(n):
        yield {
            "image": rs.rand(2, 1, 16, 16, 3).astype(np.float32),
            "mask": rs.rand(2, 1, 3, 2, 2).astype(np.float32),
            "alpha": rs.rand(2, 1, 3, 16, 16).astype(np.float32),
            "transition": (rs.rand(2, 1, 3, 16, 16) > 0.5).astype(np.float32),
            "idx": i,  # non-tensor key must survive on the host side
        }


def test_packed_infeed_roundtrip_and_order():
    from maggie_tpu.engine.infeed import TRAIN_KEYS, DeviceInfeed

    ref = list(_batches(5))
    out = list(DeviceInfeed(iter(_batches(5))))
    assert len(out) == 5
    for i, (host, dev) in enumerate(out):
        assert host["idx"] == i  # order preserved through the prefetch queue
        for k in TRAIN_KEYS:
            np.testing.assert_array_equal(np.asarray(dev[k]), ref[i][k], err_msg=k)


def test_infeed_mesh_path_matches_packed():
    import jax

    from maggie_tpu.engine.infeed import TRAIN_KEYS, DeviceInfeed
    from maggie_tpu.parallel import create_mesh

    mesh = create_mesh(2)
    packed = list(DeviceInfeed(iter(_batches(3))))
    sharded = list(DeviceInfeed(iter(_batches(3)), mesh=mesh))
    for (_, a), (_, b) in zip(packed, sharded):
        for k in TRAIN_KEYS:
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]), err_msg=k)
    # the sharded put actually lands on the mesh
    leaf = sharded[0][1]["image"]
    assert len(leaf.sharding.device_set) == 2


def test_infeed_propagates_loader_errors():
    from maggie_tpu.engine.infeed import DeviceInfeed

    def bad_iter():
        yield from _batches(1)
        raise RuntimeError("loader exploded")

    it = DeviceInfeed(bad_iter())
    next(it)  # first batch fine
    with pytest.raises(RuntimeError, match="loader exploded"):
        # the error may occupy the next slot or the one after (depth-2 prefetch)
        next(it)
        next(it)
    # the error is sticky: further next() calls re-raise instead of blocking
    # forever on the dead producer's empty queue
    with pytest.raises(RuntimeError, match="loader exploded"):
        next(it)


def test_infeed_close_stops_producer():
    from maggie_tpu.engine.infeed import DeviceInfeed

    produced = []

    def infinite():
        i = 0
        while True:
            for b in _batches(1, seed=i):
                produced.append(i)
                yield b
            i += 1

    it = DeviceInfeed(infinite())
    next(it)
    it.close()
    assert not it._thread.is_alive()
    n_after_close = len(produced)
    import time
    time.sleep(0.3)
    assert len(produced) == n_after_close  # producer really stopped
    it.close()  # idempotent
