"""Op-level device-time attribution of the TRAIN step (VERDICT r2 item 3).

Traces the bs-N block+bf16 training step (512x512 crops, 10 instance slots,
full loss, remat policy selectable) and prints the top device ops — locating
where the milliseconds of a step go (encoder SN convs? remat recompute? BN
stats? ladder backward?).

Usage: python tools/trace_train.py [bs] [remat: none|full|selective] [sparse_mode]
"""

import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from __graft_entry__ import _image_model_cfg
from maggie_tpu.engine.optim import build_optimizer
from maggie_tpu.engine.train_step import create_train_state, make_train_step
from maggie_tpu.models import build_model
from traceutil import device_op_times


def main():
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    remat = sys.argv[2] if len(sys.argv) > 2 else "full"
    sparse_mode = sys.argv[3] if len(sys.argv) > 3 else "block"

    cfg = _image_model_cfg()
    cfg.model.precision = "bf16"
    cfg.model.decoder_args.update(dict(sparse_mode=sparse_mode, block_cap_frac=0.5))
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
        "image": jnp.asarray(rs.rand(bs, 1, h, w, 3).astype(np.float32)),
        "mask": jnp.asarray((rs.rand(bs, 1, n_i, h // 8, w // 8) > 0.8).astype(np.float32)),
        "alpha": jnp.asarray(rs.rand(bs, 1, n_i, h, w).astype(np.float32)),
        "transition": jnp.asarray((rs.rand(bs, 1, n_i, h, w) > 0.8).astype(np.float32)),
    }
    state = create_train_state(model, tx,
                               jax.tree_util.tree_map(lambda x: x[:1], batch),
                               jax.random.PRNGKey(0))
    step = make_train_step(model, tx, remat=remat)
    kw = dict(use_mask_atten=False, use_gt_guidance=False,
              use_prm_weights=True, atten_loss_enabled=True)
    t0 = time.time()
    state, ld = step(state, batch, jax.random.PRNGKey(1), **kw)
    print(f"compile {time.time() - t0:.0f}s, loss {float(ld['total']):.4f}",
          flush=True)

    iters = 3
    t0 = time.time()
    with jax.profiler.trace("/tmp/jax_trace_train"):
        for _ in range(iters):
            state, ld = step(state, batch, jax.random.PRNGKey(1), **kw)
        float(ld["total"])
    wall = (time.time() - t0) / iters
    print(f"wall {wall * 1e3:.0f} ms/step ({bs / wall:.2f} samples/s)", flush=True)
    device_op_times("/tmp/jax_trace_train", iters)


if __name__ == "__main__":
    main()
