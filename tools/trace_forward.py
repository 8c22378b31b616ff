"""Op-level device-time attribution of the bench-condition forward.

Runs the block+bf16 eval forward under jax.profiler, then parses the perfetto
trace and prints the top device ops by total duration — one compile (shared
with bench.py via the persistent cache) instead of a compile per stage, which
matters when tunnel compiles are slow.

Usage: python tools/trace_forward.py [trace_dir]
"""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from __graft_entry__ import _image_model_cfg, _init_variables
from bench import _blob_batch
from maggie_tpu.models import build_model
from maggie_tpu.utils.checkpoint import fold_spectral_norm


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jax_trace"
    h, w, n_i = 576, 1024, 3
    cfg = _image_model_cfg()
    cfg.model.precision = "bf16"
    cfg.model.decoder_args.update(dict(sparse_mode="block", block_cap_frac=0.5))
    model = build_model(cfg.model)
    batch = _blob_batch(h, w, n_i)
    variables = fold_spectral_norm(_init_variables(model, n_i=3))

    fwd = jax.jit(lambda v, b: model.apply(v, b, train=False)["refined_masks"])
    float(jnp.sum(fwd(variables, batch)))  # compile + warm
    print("compiled; tracing...", flush=True)

    with jax.profiler.trace(trace_dir):
        for _ in range(5):
            out = fwd(variables, batch)
        float(jnp.sum(out))

    traces = sorted(glob.glob(os.path.join(
        trace_dir, "**", "*.trace.json.gz"), recursive=True), key=os.path.getmtime)
    if not traces:
        print("no perfetto trace found under", trace_dir)
        return
    with gzip.open(traces[-1], "rt") as f:
        data = json.load(f)

    # device-track events: pick pids whose process name mentions TPU/device
    pid_names = {}
    tid_names = {}
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
        pname = pid_names.get(e.get("pid"), "")
        tname = tid_names.get((e.get("pid"), e.get("tid")), "")
        label = (pname + " " + tname).lower()
        if not any(k in label for k in ("tpu", "device", "xla ops", "axon")):
            continue
        if "step" in tname.lower():
            continue
        name = e.get("name", "?")
        dur = e.get("dur", 0) / 1e3  # us -> ms
        dur_by_op[name] += dur
        n_by_op[name] += 1
        total += dur

    print(f"\ntotal device op time {total:.2f} ms over 5 iters "
          f"({total / 5:.2f} ms/frame)\ntop ops:")
    for name, dur in sorted(dur_by_op.items(), key=lambda kv: -kv[1])[:40]:
        print(f"  {dur / 5:8.3f} ms  x{n_by_op[name] // 5:<4d} {name[:110]}")


if __name__ == "__main__":
    main()
