"""Perfetto-trace parsing shared by trace_forward.py / trace_train.py."""

from __future__ import annotations

import glob
import gzip
import json
import os
from collections import defaultdict


def device_op_times(trace_dir: str, n_iters: int, top: int = 40) -> float:
    """Parses the newest perfetto trace under ``trace_dir`` and prints the top
    device ops by total duration / n_iters. Returns total device ms/iter."""
    traces = sorted(glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                              recursive=True), key=os.path.getmtime)
    if not traces:
        print("no perfetto trace found under", trace_dir)
        return 0.0
    with gzip.open(traces[-1], "rt") as f:
        data = json.load(f)

    pid_names, tid_names = {}, {}
    for e in data.get("traceEvents", []):
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")

    dur_by_op = defaultdict(float)
    n_by_op = defaultdict(int)
    total = 0.0
    for e in data.get("traceEvents", []):
        if e.get("ph") != "X":
            continue
        tname = tid_names.get((e.get("pid"), e.get("tid")), "").lower()
        label = (pid_names.get(e.get("pid"), "") + " " + tname).lower()
        if not any(k in label for k in ("tpu", "device", "xla ops", "axon")):
            continue
        if "step" in tname:  # whole-step umbrella track, not an op
            continue
        if e.get("name", "").startswith(("jit_", "jit(")):
            continue  # module umbrella event duplicating its ops
        name = e.get("name", "?")
        dur = e.get("dur", 0) / 1e3
        dur_by_op[name] += dur
        n_by_op[name] += 1
        total += dur

    print(f"\ntotal device op time {total:.2f} ms over {n_iters} iters "
          f"({total / n_iters:.2f} ms/iter)\ntop ops:")
    for name, dur in sorted(dur_by_op.items(), key=lambda kv: -kv[1])[:top]:
        print(f"  {dur / n_iters:8.3f} ms  x{n_by_op[name] // n_iters:<4d} "
              f"{name[:110]}")
    return total / n_iters
