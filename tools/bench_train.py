"""Training-step throughput on the local chip: image config shapes (512x512 crops,
max_inst=10), single-chip batch. Reports steps/sec and samples/sec."""

import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from __graft_entry__ import _image_model_cfg
from maggie_tpu.engine.optim import build_optimizer
from maggie_tpu.engine.train_step import create_train_state, make_train_step
from maggie_tpu.models import build_model


def main(batch_size=2, remat=True, sparse_mode="oracle", precision="fp32",
         cap_frac=0.5):
    cfg = _image_model_cfg()
    cfg.model.precision = precision
    cfg.model.decoder_args.update(dict(sparse_mode=sparse_mode,
                                       block_cap_frac=cap_frac))
    cfg.train.optimizer.name = "adamw"
    cfg.train.optimizer.lr = 1.5e-4
    cfg.train.scheduler.name = "cosine"
    cfg.train.max_iter = 52000
    cfg.train.scheduler.warmup_iters = 1000

    model = build_model(cfg.model)
    tx, _ = build_optimizer(cfg)

    rs = np.random.RandomState(0)
    h = w = 512
    n_i = 10
    batch = {
        "image": jnp.asarray(rs.rand(batch_size, 1, h, w, 3).astype(np.float32)),
        "mask": jnp.asarray((rs.rand(batch_size, 1, n_i, h // 8, w // 8) > 0.8).astype(np.float32)),
        "alpha": jnp.asarray(rs.rand(batch_size, 1, n_i, h, w).astype(np.float32)),
        "transition": jnp.asarray((rs.rand(batch_size, 1, n_i, h, w) > 0.8).astype(np.float32)),
    }
    state = create_train_state(model, tx, jax.tree_util.tree_map(lambda x: x[:1], batch),
                               jax.random.PRNGKey(0))
    step = make_train_step(model, tx, remat=remat)
    kw = dict(use_mask_atten=False, use_gt_guidance=False,
              use_prm_weights=True, atten_loss_enabled=True)
    state, ld = step(state, batch, jax.random.PRNGKey(1), **kw)
    print("compile ok, loss:", float(ld["total"]), flush=True)
    # compiled HBM footprint: the tunneled platform exposes no live
    # memory_stats(), so report XLA's own allocation analysis of the step.
    # Opt-out via BENCH_TRAIN_NO_MEMINFO=1: the lowered-executable compile is a
    # SECOND multi-minute tunnel compile that pure-throughput runs can skip.
    if os.environ.get("BENCH_TRAIN_NO_MEMINFO"):
        pass
    else:
        _mem_analysis(step, state, batch, kw)
    t0 = time.perf_counter()
    iters = 5
    for _ in range(iters):
        state, ld = step(state, batch, jax.random.PRNGKey(1), **kw)
    float(ld["total"])  # sync
    dt = (time.perf_counter() - t0) / iters
    from maggie_tpu.utils.memory import device_peak_memory_mb
    peak = device_peak_memory_mb()
    print(f"bs={batch_size} remat={remat} sparse={sparse_mode} prec={precision}: "
          f"{dt*1000:.1f} ms/step, {batch_size/dt:.2f} samples/sec"
          + (f", peak {peak:.0f}MB" if peak is not None else ""), flush=True)


def _mem_analysis(step, state, batch, kw):
    import jax
    try:
        compiled = step.lower(state, batch, jax.random.PRNGKey(1), **kw).compile()
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        if ca and ca.get("flops"):
            print(f"xla cost analysis: {ca['flops'] / 1e12:.2f} TFLOP/step", flush=True)
        ma = compiled.memory_analysis()
        if ma is not None:
            tot = (ma.temp_size_in_bytes + ma.argument_size_in_bytes
                   + ma.output_size_in_bytes - ma.alias_size_in_bytes)
            print(f"xla memory analysis: temp {ma.temp_size_in_bytes / 2**30:.2f} GiB, "
                  f"args {ma.argument_size_in_bytes / 2**30:.2f} GiB, "
                  f"out {ma.output_size_in_bytes / 2**30:.2f} GiB, "
                  f"aliased -{ma.alias_size_in_bytes / 2**30:.2f} GiB "
                  f"=> peak ~{tot / 2**30:.2f} GiB", flush=True)
    except Exception as e:
        print(f"memory analysis unavailable: {e}", flush=True)


if __name__ == "__main__":
    # bench_train.py [batch] [remat 0|1|none|full|selective] [sparse oracle|block]
    #                [precision fp32|bf16]
    _r = sys.argv[2] if len(sys.argv) > 2 else "full"
    main(batch_size=int(sys.argv[1]) if len(sys.argv) > 1 else 2,
         remat={"0": "none", "1": "full"}.get(_r, _r),
         sparse_mode=sys.argv[3] if len(sys.argv) > 3 else "oracle",
         precision=sys.argv[4] if len(sys.argv) > 4 else "fp32")
