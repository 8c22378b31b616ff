"""Block-mode vs oracle-mode training convergence (VERDICT r2 item 3).

Runs N identical training iterations (same init, same data stream, same rngs)
with the dense-masked oracle ladder and with the fixed-capacity block ladder,
and writes both loss curves to JSON. One-step numerical parity is already
tested (tests/test_blocksparse.py); this shows the capacity-drop + core-window
BN-statistics scheme does not destabilize OPTIMIZATION over hundreds of steps.

Synthetic data: procedural human-like alphas (tools/cap_quality.py) composited
on noise backgrounds, coarse masks derived by downsampling — the structural
regime the real pipeline produces.

Usage: python tools/train_curve.py [iters] [size] [out.json] [cap_frac]
"""

import json
import sys

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

import numpy as np


def make_batch(seed, h, w, n_i=3):
    from cap_quality import procedural_alpha
    rs = np.random.RandomState(seed)
    alpha = procedural_alpha(seed, h, w, n_i=n_i)      # (n_i, h, w)
    fg = rs.rand(h, w, 3).astype(np.float32)
    comp = fg * 0.5 + 0.25  # flat-ish scene; image content is not the point
    mask = (alpha[:, ::8, ::8] > 0.5).astype(np.float32)
    trans = ((alpha > 0.05) & (alpha < 0.95)).astype(np.float32)
    return {
        "image": comp[None, None],
        "mask": mask[None, None],
        "alpha": alpha[None, None],
        "transition": trans[None, None],
    }


def run(sparse_mode, iters, h, w, cap_frac):
    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _image_model_cfg
    from maggie_tpu.engine.optim import build_optimizer
    from maggie_tpu.engine.train_step import create_train_state, make_train_step
    from maggie_tpu.models import build_model

    cfg = _image_model_cfg(atten_dim=32, final_channel=32)
    cfg.model.decoder_args.update(dict(
        sparse_mode=sparse_mode, block_cap_frac=cap_frac,
        inst_spec_dropout=0.0, detail_mask_dropout=0.0))
    cfg.train.optimizer.name = "adamw"
    cfg.train.optimizer.lr = 1.5e-4
    cfg.train.scheduler.name = "cosine"
    cfg.train.max_iter = max(iters, 100)
    cfg.train.scheduler.warmup_iters = max(iters // 10, 1)

    model = build_model(cfg.model)
    tx, _ = build_optimizer(cfg)
    init_batch = {k: jnp.asarray(v) for k, v in make_batch(0, h, w).items()}
    state = create_train_state(model, tx, init_batch, jax.random.PRNGKey(0))
    step = make_train_step(model, tx, remat="none")
    kw = dict(use_mask_atten=False, use_gt_guidance=False,
              use_prm_weights=True, atten_loss_enabled=True)
    losses = []
    for i in range(iters):
        batch = {k: jnp.asarray(v) for k, v in make_batch(i % 64, h, w).items()}
        state, ld = step(state, batch, jax.random.PRNGKey(7), **kw)
        losses.append(float(ld["total"]))
        if i % 20 == 0:
            print(f"[{sparse_mode}] iter {i}: {losses[-1]:.4f}", flush=True)
    return losses


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 192
    out = sys.argv[3] if len(sys.argv) > 3 else "output/train_curve.json"
    cap = float(sys.argv[4]) if len(sys.argv) > 4 else 0.5
    curves = {m: run(m, iters, size, size, cap) for m in ("oracle", "block")}
    import os
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    with open(out, "w") as f:
        json.dump(curves, f)
    o, b = np.array(curves["oracle"]), np.array(curves["block"])
    k = max(iters // 10, 1)
    print(f"final-{k} mean loss: oracle {o[-k:].mean():.4f} "
          f"block {b[-k:].mean():.4f}; "
          f"max |gap| overall {np.abs(o - b).max():.4f}; "
          f"corr {np.corrcoef(o, b)[0, 1]:.5f}")


if __name__ == "__main__":
    main()
