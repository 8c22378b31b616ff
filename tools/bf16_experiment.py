"""Measure bf16 eval speed + output drift vs f32 on the flagship model.

Casting params/stats/activations to bf16 halves HBM traffic; this quantifies the
throughput gain and the alpha-output drift to decide the default eval precision.
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from __graft_entry__ import _image_model_cfg, _make_batch
from maggie_tpu.models import build_model


def cast_tree(tree, dtype):
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, tree)


def timed(fn, v, b, iters=10):
    f = jax.jit(lambda c, v, b: jnp.sum(fn(v, b).astype(jnp.float32)) + c * 0.0)
    c = jnp.float32(0.0)
    float(f(c, v, b))
    t0 = time.perf_counter()
    for _ in range(iters):
        c = f(c, v, b)
    float(c)
    return (time.perf_counter() - t0) / iters


def main():
    h, w, n_i = 576, 1024, 3
    cfg = _image_model_cfg()
    model = build_model(cfg.model)
    batch = _make_batch(1, 1, n_i, h, w, seed=0)
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch, train=False)

    fwd = lambda v, b: model.apply(v, b, train=False)["refined_masks"]
    t32 = timed(fwd, variables, batch)
    out32 = np.asarray(jax.jit(fwd)(variables, batch))

    v16 = cast_tree(variables, jnp.bfloat16)
    b16 = cast_tree(batch, jnp.bfloat16)
    t16 = timed(fwd, v16, b16)
    out16 = np.asarray(jax.jit(fwd)(v16, b16)).astype(np.float32)

    drift = np.abs(out32 - out16)
    print(f"f32:  {t32*1000:.2f} ms/frame  ({1/t32:.2f} fps)")
    print(f"bf16: {t16*1000:.2f} ms/frame  ({1/t16:.2f} fps)  speedup {t32/t16:.2f}x")
    print(f"alpha drift: mean {drift.mean():.5f}  p99 {np.percentile(drift, 99):.5f}  max {drift.max():.5f}")
    # drift in MAD-metric units (per-map mean / masksum scaling collapses to mean here)
    print(f"MAD(f32 vs bf16) per-pixel mean: {drift.mean():.6f}")


if __name__ == "__main__":
    main()
