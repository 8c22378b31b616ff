"""Real multi-PROCESS execution of the cross-process paths (VERDICT r2 item 7).

The reference runs multi-process DDP with gloo object gathers
(``/root/reference/maggie/utils/dist.py:36-65``); the TPU build's equivalents are
per-process loader sharding (``data/loader.py``) and
``Metric.gather_metric`` -> ``multihost_utils.process_allgather``
(``utils/metrics.py:57-64``). Until now those paths only ever executed with
``jax.process_count() == 1``. Here two REAL processes are launched with
``jax.distributed.initialize`` on the CPU backend and assert:

- each process sees ``process_count() == 2``;
- ``DataLoader(num_shards=2, shard_index=pid)`` shards are disjoint and cover
  the dataset;
- ``Metric.gather_metric`` sums score/count across processes (each process
  updates with different data; both must end at the global average).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np

_WORKER = r"""
import json, os, sys
import numpy as np
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")

port, pid, out_path = sys.argv[1], int(sys.argv[2]), sys.argv[3]
jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.process_index() == pid

from maggie_tpu.data.loader import DataLoader  # cwd (repo root) is on sys.path
from maggie_tpu.utils.metrics import MAD


class IdxDataset:
    def __len__(self):
        return 11

    def __getitem__(self, i):
        return {"idx": np.array([i])}


loader = DataLoader(IdxDataset(), batch_size=2,
                    num_shards=jax.process_count(),
                    shard_index=jax.process_index())
seen = sorted(int(v) for b in loader for v in b["idx"].ravel())

# per-process different data; the gathered metric must be the global sum
rs = np.random.RandomState(100 + pid)
pred = rs.rand(2, 16, 16).astype(np.float32)
gt = rs.rand(2, 16, 16).astype(np.float32)
m = MAD()
m.update(pred, gt)
local = (float(m.score), float(m.count))
m.gather_metric()

with open(out_path, "w") as f:
    json.dump({"pid": pid, "seen": seen, "local": local,
               "gathered": [float(m.score), float(m.count)],
               "avg": float(m.average())}, f)
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_loader_shards_and_metric_gather(tmp_path):
    port = _free_port()
    outs = [str(tmp_path / f"w{i}.json") for i in range(2)]
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)  # no virtual device split in the workers
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = [
        subprocess.Popen([sys.executable, "-c", _WORKER, str(port), str(i), outs[i]],
                         env=env, cwd=repo,
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        for i in range(2)
    ]
    results = []
    for p, out in zip(procs, outs):
        so, se = p.communicate(timeout=180)
        assert p.returncode == 0, f"worker failed:\n{se.decode()[-2000:]}"
        with open(out) as f:
            results.append(json.load(f))

    # loader shards: disjoint, and together exactly the dataset (11 items)
    s0, s1 = set(results[0]["seen"]), set(results[1]["seen"])
    assert not (s0 & s1), (s0, s1)
    assert sorted(s0 | s1) == list(range(11))
    # the strided shard split gives ceil/floor sizes
    assert {len(s0), len(s1)} == {6, 5}

    # metric gather: both processes end at the summed score/count
    want_score = results[0]["local"][0] + results[1]["local"][0]
    want_count = results[0]["local"][1] + results[1]["local"][1]
    # rtol: process_allgather runs in f32 (jax x64 off), so sums round at ~1e-7
    for r in results:
        np.testing.assert_allclose(r["gathered"], [want_score, want_count],
                                   rtol=1e-6)
        np.testing.assert_allclose(r["avg"], want_score / (want_count + 1e-6),
                                   rtol=1e-6)
