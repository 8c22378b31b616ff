"""End-to-end eval pipeline benchmark: is host data prep hidden at 149 f/s?

Synthesizes a small HIM-style eval set on disk (576p jpgs + per-instance alpha
and mask PNGs from tools/cap_quality.py's procedural scenes), then runs the
REAL path — HIMDataset transform chain -> prefetching DataLoader ->
software-pipelined ``engine.test.eval_image`` with the flagship block+bf16
model — and reports batch_time (device+sync) vs data_time (host decode/
transform), the numbers the reference logs per run (``engine/test.py:155``).

This quantifies VERDICT r2 missing item 5: the device forward is ~7 ms/frame,
so on this single-core host the cv2 decode/resize chain is expected to be the
bottleneck — the point is to MEASURE it and record where the e2e ceiling sits.

Usage: python tools/bench_pipeline.py [n_images] [data_dir]
"""

import os
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

import cv2
import numpy as np


def synth_dataset(root, n, h=576, w=1024, n_i=3):
    # EVAL layout: root/images/<split>/*.jpg + root/<dir>/<split>/<name>/*.png
    from cap_quality import procedural_alpha
    img_dir = os.path.join(root, "images", "synth")
    os.makedirs(img_dir, exist_ok=True)
    rs = np.random.RandomState(0)
    for s in range(n):
        alpha = procedural_alpha(s, h, w, n_i=n_i)
        bg = (rs.rand(h, w, 3) * 255).astype(np.uint8)
        fg = np.stack([np.full((h, w), rs.randint(0, 255), np.uint8)
                       for _ in range(3)], -1)
        acc = alpha.max(0)[..., None]
        comp = (fg * acc + bg * (1 - acc)).astype(np.uint8)
        name = f"im{s:04d}"
        cv2.imwrite(os.path.join(img_dir, name + ".jpg"), comp)
        for d in ("alphas", "masks"):
            os.makedirs(os.path.join(root, d, "synth", name), exist_ok=True)
        for j in range(n_i):
            a8 = (alpha[j] * 255).astype(np.uint8)
            cv2.imwrite(os.path.join(root, "alphas", "synth", name,
                                     f"{j:02d}.png"), a8)
            m = ((alpha[j] > 0.5) * 255).astype(np.uint8)
            cv2.imwrite(os.path.join(root, "masks", "synth", name,
                                     f"{j:02d}.png"), m)
    return root


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    root = sys.argv[2] if len(sys.argv) > 2 else "/tmp/him_synth"
    if not os.path.isdir(os.path.join(root, "images", "synth")):
        print("synthesizing dataset...", flush=True)
        synth_dataset(root, n)

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from __graft_entry__ import _image_model_cfg, _init_variables
    from maggie_tpu.data.him import HIMDataset
    from maggie_tpu.data.loader import DataLoader
    from maggie_tpu.engine.test import eval_image
    from maggie_tpu.models import build_model
    from maggie_tpu.utils.checkpoint import fold_spectral_norm
    from maggie_tpu.utils.metrics import MAD, SAD

    cfg = _image_model_cfg()
    cfg.model.precision = "bf16"
    cfg.model.decoder_args.update(dict(sparse_mode="block", block_cap_frac=0.5))
    model = build_model(cfg.model)
    variables = fold_spectral_norm(_init_variables(model, n_i=3))

    for device_pre in (False, True):
        ds = HIMDataset(root_dir=root, split="synth", short_size=576,
                        is_train=False, alpha_dir_name="alphas",
                        mask_dir_name="masks", downscale_mask=True,
                        device_preprocess=device_pre)
        loader = DataLoader(ds, batch_size=1, prefetch=2)
        # warm pass compiles; timed pass measures steady state
        for tag in ("warm", "timed"):
            # fresh meters per pass: they accumulate, and a running average
            # over both passes would hide a warm-vs-timed divergence
            metrics = {"MAD": MAD(), "SAD": SAD()}
            t0 = time.time()
            bt, dt_ = eval_image(model, variables, loader, log_iter=1000,
                                 val_error_dict=metrics, shape_bucketing=True)
            wall = time.time() - t0
            print(f"[host_pre={not device_pre} {tag}] "
                  f"batch_time {bt * 1e3:.1f} ms  data_time {dt_ * 1e3:.1f} ms"
                  f"  wall {wall:.1f}s -> {len(ds) / wall:.1f} frames/s e2e "
                  f"(MAD {metrics['MAD'].average():.2f})",
                  flush=True)


if __name__ == "__main__":
    main()
