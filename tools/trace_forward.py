"""Op-level device-time attribution of the bench-condition forward.

Runs the block+bf16 eval forward under jax.profiler, then parses the perfetto
trace and prints the top device ops by total duration — one compile (shared
with bench.py via the persistent cache) instead of a compile per stage, which
matters when tunnel compiles are slow. Parsing is shared with
trace_train.py / trace_video.py (tools/traceutil.py) so the attributions of
the three tools are directly comparable.

Usage: python tools/trace_forward.py [trace_dir]
"""

import sys

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from __graft_entry__ import _image_model_cfg, _init_variables
from bench import _blob_batch
from maggie_tpu.models import build_model
from maggie_tpu.utils.checkpoint import fold_spectral_norm
from traceutil import device_op_times


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

    device_op_times(trace_dir, n_iters=5)


if __name__ == "__main__":
    main()
