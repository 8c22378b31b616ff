"""Sustained END-TO-END train throughput: real loader + packed infeed + device.

The train envelope numbers (docs/DESIGN.md) came from two separate
measurements — ~92 ms/sample host transform cost and a device-only step time
(7.97 samples/s at bs6-selective) — never as ONE wall-clocked number through
the real pipeline. This tool drives ``engine.train`` itself (HIM loader with
the full augmentation chain, packed double-buffered infeed, jitted train
step) at the production image condition (flagship dims, 512x512 crops, bs 6,
selective remat, bf16, AdamW + cosine, the real warmup gates) over an
on-disk synthetic I-HIM-style set for >= 200 measured steps, and reports the
sustained samples/s with the batch_time/data_time split the reference logs
for exactly this purpose (``/root/reference/maggie/engine/train.py:192-218``).

The first iteration (compile / persistent-cache load) is excluded by
``engine.train``'s meters; everything else — host decode+augment, H2D, device
step, dispatch — is included. Writes output/bench_train_sustained.json.

Usage: python tools/bench_train_sustained.py [iters=221] [batch_size=6]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 221
    bs = int(sys.argv[2]) if len(sys.argv) > 2 else 6

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    root = os.environ.get("SUSTAINED_TRAIN_ROOT", "/tmp/him_train_sustained")
    marker = os.path.join(root, ".n48_576")
    if not os.path.exists(marker):
        subprocess.run([sys.executable, "tools/make_synthetic_him.py", root,
                        "48", "4", "576", "1024"], check=True, cwd=repo)
        open(marker, "w").close()

    from maggie_tpu.config import load_config
    from maggie_tpu.engine.train import train

    cfg = load_config(os.path.join(repo, "configs/maggie_image.yaml"))
    # production condition except: synthetic data root, bs 6 (the measured
    # single-chip optimum — the config's bs 12 is the 4-GPU per-proc value),
    # selective remat, bf16, and no validation inside the measured window
    cfg.dataset.train.root_dir = root
    cfg.dataset.train.split = "tr"
    cfg.dataset.test.merge_from_other(dict(
        root_dir=root, split="natural", short_size=576,
        alpha_dir_name="alphas", mask_dir_name="masks", downscale_mask=True))
    cfg.model.precision = "bf16"
    cfg.model.remat = "selective"
    cfg.model.encoder_args.pretrained = False
    cfg.train.batch_size = bs
    cfg.train.max_iter = iters
    cfg.train.log_iter = 20
    cfg.train.val_iter = iters + 1000    # no val inside the measured window
    cfg.train.vis_iter = iters + 1000
    cfg.wandb.use = False
    cfg.name = "bench_train_sustained"
    cfg.output_dir = "/tmp/bench_train_sustained_out"
    os.makedirs(cfg.output_dir, exist_ok=True)

    t0 = time.time()
    train(cfg, use_wandb=False)
    wall = time.time() - t0

    with open(os.path.join(cfg.output_dir, "train_meters.json")) as f:
        meters = json.load(f)
    result = {
        "condition": f"flagship dims, 512x512 crops, bs{bs}, selective remat, "
                     "bf16, AdamW+cosine, real HIM loader + packed infeed, "
                     "first iter excluded",
        "iters_requested": iters,
        "wall_s_incl_compile": round(wall, 1),
        **meters,
        "device_only_reference_samples_per_sec": 7.97,  # docs/DESIGN.md envelope
        "measured_at": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    os.makedirs(os.path.join(repo, "output"), exist_ok=True)
    with open(os.path.join(repo, "output/bench_train_sustained.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
