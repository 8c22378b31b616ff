"""Long-horizon optimization stability on synthetic data (VERDICT r3 item 3).

The 300-iter block-vs-oracle overlay (tools/train_curve.py) shows one-step and
short-horizon parity; this runs the BLOCK ladder alone for ~2k iterations at
the production training condition (bf16, selective remat, cap 0.5) with
periodic held-out validation (eval-mode forward, MAD/MSE vs GT alpha on fixed
synthetic scenes), demonstrating stability past the 300-iter horizon. Writes
loss curve + val series to JSON.

Usage: python tools/train_long.py [iters] [size] [out.json] [val_every]
"""

import json
import os
import sys

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

import numpy as np

from train_curve import make_batch  # noqa: E402


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 192
    out = sys.argv[3] if len(sys.argv) > 3 else "output/train_long.json"
    val_every = int(sys.argv[4]) if len(sys.argv) > 4 else 200

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from __graft_entry__ import _image_model_cfg
    from maggie_tpu.engine.optim import build_optimizer
    from maggie_tpu.engine.train_step import create_train_state, make_train_step
    from maggie_tpu.models import build_model

    cfg = _image_model_cfg(atten_dim=32, final_channel=32)
    cfg.model.precision = "bf16"
    cfg.model.decoder_args.update(dict(
        sparse_mode="block", block_cap_frac=0.5,
        inst_spec_dropout=0.0, detail_mask_dropout=0.0))
    cfg.train.optimizer.name = "adamw"
    cfg.train.optimizer.lr = 1.5e-4
    cfg.train.scheduler.name = "cosine"
    cfg.train.max_iter = iters
    cfg.train.scheduler.warmup_iters = max(iters // 20, 1)

    model = build_model(cfg.model)
    tx, _ = build_optimizer(cfg)
    init_batch = {k: jnp.asarray(v) for k, v in make_batch(0, size, size).items()}
    state = create_train_state(model, tx, init_batch, jax.random.PRNGKey(0))
    step = make_train_step(model, tx, remat="selective")
    kw = dict(use_mask_atten=False, use_gt_guidance=False,
              use_prm_weights=True, atten_loss_enabled=True)

    # fixed held-out scenes (seeds outside the 0..63 training cycle)
    val_batches = [{k: jnp.asarray(v) for k, v in make_batch(1000 + j, size, size).items()}
                   for j in range(8)]
    fwd = jax.jit(lambda v, b: model.apply(v, b, train=False)["refined_masks"])

    def validate():
        mads, mses = [], []
        for vb in val_batches:
            pred = np.asarray(fwd({"params": state.params,
                                   "batch_stats": state.batch_stats,
                                   "spectral": state.spectral}, vb),
                              np.float32)
            gt = np.asarray(vb["alpha"], np.float32)
            mads.append(float(np.abs(pred - gt).mean() * 1e3))
            mses.append(float(((pred - gt) ** 2).mean() * 1e3))
        return float(np.mean(mads)), float(np.mean(mses))

    losses, val_series = [], []
    import time
    t0 = time.time()
    for i in range(iters):
        batch = {k: jnp.asarray(v) for k, v in make_batch(i % 64, size, size).items()}
        state, ld = step(state, batch, jax.random.PRNGKey(7), **kw)
        losses.append(float(ld["total"]))
        if not np.isfinite(losses[-1]):
            print(f"NON-FINITE LOSS at iter {i}", flush=True)
            break
        if i % val_every == 0 or i == iters - 1:
            mad, mse = validate()
            val_series.append({"iter": i, "MADx1e3": mad, "MSEx1e3": mse,
                               "loss": losses[-1]})
            print(f"iter {i}: loss {losses[-1]:.4f}, val MADx1e3 {mad:.2f}, "
                  f"MSEx1e3 {mse:.2f} ({time.time() - t0:.0f}s)", flush=True)

    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    with open(out, "w") as f:
        json.dump({"losses": losses, "val": val_series,
                   "iters": iters, "size": size}, f)
    l0 = np.mean(losses[:50])
    l1 = np.mean(losses[-50:])
    print(f"done: mean loss first-50 {l0:.4f} -> last-50 {l1:.4f}; "
          f"val MAD {val_series[0]['MADx1e3']:.2f} -> {val_series[-1]['MADx1e3']:.2f}; "
          f"all finite: {np.all(np.isfinite(losses))}")


if __name__ == "__main__":
    main()
