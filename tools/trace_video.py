"""Op-level device-time attribution of the VIDEO streaming clip forward.

Same method as trace_forward.py, on the bench_video condition (576p, 3-inst,
clip3/overlap2, bf16, block cap 0.5): one clip forward with prev_pred carried,
traced 5x, perfetto parse via traceutil.

Usage: python tools/trace_video.py [trace_dir]
"""

import sys

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench_video import _clip_batch
from traceutil import device_op_times
from maggie_tpu.config import load_config
from maggie_tpu.models import build_model
from maggie_tpu.utils.checkpoint import fold_spectral_norm


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jax_trace_video"
    cfg = load_config("configs/maggie_video.yaml")
    cfg.model.precision = "bf16"
    cfg.model.decoder_args.update(dict(sparse_mode="block", block_cap_frac=0.5))
    cfg.model.encoder_args.num_mask = 10
    model = build_model(cfg.model)

    batch = _clip_batch(576, 1024, 3)
    variables = fold_spectral_norm(
        model.init({"params": jax.random.PRNGKey(0)}, batch, train=False))
    prev0 = model.apply(variables, batch, train=False)["refined_masks"][:, 1]

    fwd = jax.jit(lambda v, b, p: model.apply(
        v, b, train=False, mem_feat=None, prev_pred=p)["refined_masks"])
    float(jnp.sum(fwd(variables, batch, prev0)))
    print("compiled; tracing...", flush=True)

    with jax.profiler.trace(trace_dir):
        for _ in range(5):
            out = fwd(variables, batch, prev0)
        float(jnp.sum(out))

    device_op_times(trace_dir, 5)


if __name__ == "__main__":
    main()
