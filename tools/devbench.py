"""Device-time microbenchmark harness: loops INSIDE jit via lax.scan so the
tunneled platform's ~3ms dispatch latency amortizes away.

timed_device(fn, *args) reports per-iteration device time for fn, where fn's
output feeds a tiny perturbation of its first arg each iteration (true serial
dependency, no overlap, no DCE).
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timed_device(fn, *args, iters=50, name="", reps=3):
    def loop(x0, rest):
        def body(carry, _):
            out = fn(carry, *rest)
            s = jnp.sum(out).astype(x0.dtype) * 1e-20
            return x0 + s, ()
        final, _ = jax.lax.scan(body, x0, None, length=iters)
        return jnp.sum(final)

    f = jax.jit(lambda x0, rest: loop(x0, rest))
    rest = args[1:]
    float(f(args[0], rest))  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(f(args[0], rest))
        best = min(best, time.perf_counter() - t0)
    per = (best - 0.003) / iters  # subtract ~dispatch floor once
    print(f"{name:46s} {per*1000:8.3f} ms/iter", flush=True)
    return per
