"""Sustained END-TO-END image-eval throughput: device + host, metrics on.

The headline bench (bench.py) reports pure device time per frame; a real sweep
also pays host-side decode, reverse_transform, and the metric suite
(Conn/Grad are the expensive ones; the reference's own eval loop logs
batch_time/data_time for exactly this, ``/root/reference/maggie/engine/test.py:155-156``).
This tool wall-clocks ``engine.test`` over a synthetic 576p HIM sweep on the
real chip — metrics ON, save_results OFF — and reports sustained frames/s
beside the device-only number, plus the batch/data-time split.

Usage: python tools/bench_sustained.py [n_images] [--metrics MAD,MSE,...]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_images = int(args[0]) if args else 30
    metrics = ["MAD", "MSE", "SAD", "Grad", "Conn"]
    for a in sys.argv[1:]:
        if a.startswith("--metrics"):
            metrics = a.split("=", 1)[1].split(",")

    if "--cpu" in sys.argv:     # CPU smoke (shrink with SUSTAINED_HW="H W")
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    cache = ("/root/.cache/jax_comp_cache_cpu" if "--cpu" in sys.argv
             else "/root/.cache/jax_comp_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    # SUSTAINED_HW="H W" shrinks the synthetic sweep (CPU smoke); the real
    # measurement condition is the default 576x1024 eval size
    h, w = (os.environ.get("SUSTAINED_HW") or "576 1024").split()
    root = os.environ.get("SUSTAINED_ROOT", f"/tmp/him_sustained_{h}")
    marker = os.path.join(root, f".n{n_images}_{h}")
    if not os.path.exists(marker):
        subprocess.run([sys.executable, "tools/make_synthetic_him.py", root,
                        "0", str(n_images), h, w], check=True,
                       cwd=REPO)
        open(marker, "w").close()

    from __graft_entry__ import _image_model_cfg, _init_variables
    from maggie_tpu.engine.test import test as run_test
    from maggie_tpu.models import build_model
    from maggie_tpu.utils.checkpoint import fold_spectral_norm

    cfg = _image_model_cfg()
    cfg.model.precision = "bf16"
    cfg.model.decoder_args.update(dict(sparse_mode="block", block_cap_frac=0.5))
    if os.environ.get("BENCH_OVERRIDES"):
        cfg.merge_from_list(os.environ["BENCH_OVERRIDES"].split())
    cfg.name = "bench_sustained"
    cfg.output_dir = "/tmp/bench_sustained_out"
    cfg.dataset.test.merge_from_other(dict(
        name="HIM", root_dir=root, split="natural", short_size=int(h),
        alpha_dir_name="alphas", mask_dir_name="masks", downscale_mask=True))
    cfg.test.merge_from_other(dict(
        batch_size=1, metrics=metrics, postprocessing=False,
        save_results=False, log_iter=10))

    model = build_model(cfg.model)
    variables = fold_spectral_norm(_init_variables(model, n_i=3))

    # warm pass over a FEW images first: compile + bucket shapes out of the
    # timed window (a sweep's steady state is what we're measuring)
    import copy
    warm_cfg = copy.deepcopy(cfg)
    warm_root_n = 3
    run_test_n_images(warm_cfg, variables, run_test, warm_root_n)

    t0 = time.time()
    results, batch_time, data_time = run_test(cfg, variables=variables,
                                              return_timing=True)
    wall = time.time() - t0
    fps = n_images / wall
    print(f"[sustained] {n_images} images, metrics {metrics}: "
          f"{wall:.1f} s wall -> {fps:.2f} frames/s end-to-end "
          f"(batch_time {batch_time:.4f}s, data_time {data_time:.4f}s)",
          file=sys.stderr)

    # second pass: the jit-compiled device preprocessing tail (uint8 H2D +
    # on-device resize/normalize, data/device_pipeline.py) — 4x less host->
    # device traffic per frame; bit-identical model input at ratio==1
    dp_cfg = copy.deepcopy(cfg)
    dp_cfg.dataset.test.device_preprocess = True
    run_test_n_images(copy.deepcopy(dp_cfg), variables, run_test, warm_root_n)
    t0 = time.time()
    dp_results, dp_batch, dp_data = run_test(dp_cfg, variables=variables,
                                             return_timing=True)
    dp_wall = time.time() - t0
    dp_fps = n_images / dp_wall
    print(f"[sustained/device_preprocess] {dp_wall:.1f} s wall -> "
          f"{dp_fps:.2f} frames/s end-to-end (batch_time {dp_batch:.4f}s, "
          f"data_time {dp_data:.4f}s, MAD {dp_results.get('MAD')})",
          file=sys.stderr)
    repo = REPO
    device_only = None
    try:
        with open(os.path.join(repo, "output/bench_last.json")) as f:
            device_only = json.load(f).get("value")
    except Exception:
        pass
    result = {
        "metric": "maggie_image_eval_576p_sustained_frames_per_sec",
        "value": round(fps, 3), "unit": "frames/sec",
        "n_images": n_images, "wall_s": round(wall, 2),
        "batch_time_avg_s": round(batch_time, 4),
        "data_time_avg_s": round(data_time, 4),
        "metrics": metrics,
        "MAD": float(results.get("MAD", np.nan)),
        "device_preprocess": {
            "value": round(dp_fps, 3), "wall_s": round(dp_wall, 2),
            "batch_time_avg_s": round(dp_batch, 4),
            "data_time_avg_s": round(dp_data, 4),
            "MAD": float(dp_results.get("MAD", np.nan)),
        },
        "device_only_headline_fps": device_only,
        "short_size": int(h),
        "measured_at": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    if not os.environ.get("SUSTAINED_HW"):   # smoke runs don't overwrite the artifact
        os.makedirs(os.path.join(repo, "output"), exist_ok=True)
        with open(os.path.join(repo, "output/bench_sustained.json"), "w") as f:
            json.dump(result, f, indent=1)
    print(json.dumps(result))


def run_test_n_images(cfg, variables, run_test, n):
    """Warmup on a truncated copy of the dataset listing (first n images)."""
    import shutil
    src = cfg.dataset.test.root_dir
    warm = src + "_warm"
    if not os.path.exists(os.path.join(warm, ".ok")):
        shutil.rmtree(warm, ignore_errors=True)
        for sub in ["images", "alphas", "masks"]:
            sdir = os.path.join(src, sub, cfg.dataset.test.split)
            ddir = os.path.join(warm, sub, cfg.dataset.test.split)
            os.makedirs(ddir, exist_ok=True)
            for name in sorted(os.listdir(sdir))[:n]:
                s = os.path.join(sdir, name)
                d = os.path.join(ddir, name)
                (shutil.copytree if os.path.isdir(s) else shutil.copy)(s, d)
        open(os.path.join(warm, ".ok"), "w").close()
    import copy
    wcfg = copy.deepcopy(cfg)
    wcfg.dataset.test.root_dir = warm
    wcfg.output_dir = "/tmp/bench_sustained_warm"
    run_test(wcfg, variables=variables)


if __name__ == "__main__":
    main()
