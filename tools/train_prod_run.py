"""Long-horizon training at the PRODUCTION condition through the real CLI.

VERDICT r4 weak-4: the 2k-iter stability run (tools/train_long.py) used a
shrunken model (atten 32 / fc 32) at 192^2 on recycled in-memory batches.
This driver runs the FLAGSHIP dims (atten 128 / final_channel 64) at 512^2
crops through the REAL pipeline — ``tools/main.py`` CLI, HIM loader with the
full augmentation chain, packed infeed, bs6-selective-bf16 (the measured
single-chip optimum; the reference schedule is bs12/GPU x 4 GPUs,
``/root/reference/configs/maggie_image.yaml:83-102``) — in two phases:

  phase A: iters 0..1000   (periodic ckpt every 100, val every 250)
  phase B: resume_last -> iters 1000..2000   (exercises mid-run resume)

The val split is the synthetic eval set (guidance masks degraded DownUpMask-
style), so val MAD measures refinement of imperfect masks — the actual task.
Writes output/train_prod.json with the loss curve, val series, and phase
boundary, parsed from the run's rank-0 log.

Usage: python tools/train_prod_run.py [total_iters=2000] [resume_at=1000]
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _cli(root: str, out_dir: str, max_iter: int, resume_last: bool) -> list[str]:
    ov = [
        "dataset.train.root_dir", root,
        "dataset.train.split", "tr",
        "dataset.test.root_dir", root,
        "dataset.test.split", "natural",
        "dataset.test.downscale_mask", "true",
        "dataset.test.mask_dir_name", "masks",
        "model.precision", "bf16",
        "model.remat", "selective",
        "model.encoder_args.pretrained", "false",
        "train.batch_size", "6",
        "train.max_iter", str(max_iter),
        "train.val_iter", "250",
        "train.ckpt_iter", "100",
        "train.log_iter", "20",
        "train.vis_iter", "100000",
        "train.resume_last", "true" if resume_last else "false",
        "name", "train_prod",
        "output_dir", out_dir,
        "wandb.use", "false",
    ]
    return [sys.executable, "tools/main.py",
            "--config", "configs/maggie_image.yaml"] + ov


def _parse_log(path: str) -> dict:
    iters, vals = [], []
    it_re = re.compile(
        r"Iter: (\d+)/\d+.*?total: ([\d.eE+-]+).*?batch_time: ([\d.]+)s, "
        r"data_time: ([\d.]+)s")
    val_re = re.compile(r"Validation:(.*)")
    last_it = 0
    with open(path) as f:
        for line in f:
            m = it_re.search(line)
            if m:
                last_it = int(m.group(1))
                iters.append({"iter": last_it, "total": float(m.group(2)),
                              "batch_time": float(m.group(3)),
                              "data_time": float(m.group(4))})
            m = val_re.search(line)
            if m:
                kv = dict(p.split(": ") for p in m.group(1).strip().split(", "))
                vals.append({"iter": last_it,
                             **{k: float(v) for k, v in kv.items()}})
    return {"loss_curve": iters, "val_series": vals}


def main():
    total = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    resume_at = int(sys.argv[2]) if len(sys.argv) > 2 else total // 2

    root = os.environ.get("SUSTAINED_TRAIN_ROOT", "/tmp/him_train_sustained")
    marker = os.path.join(root, ".n48_576")
    if not os.path.exists(marker):
        subprocess.run([sys.executable, "tools/make_synthetic_him.py", root,
                        "48", "4", "576", "1024"], check=True, cwd=REPO)
        open(marker, "w").close()

    out_dir = os.environ.get("TRAIN_PROD_OUT", "/tmp/train_prod_out")
    os.makedirs(out_dir, exist_ok=True)
    t0 = time.time()
    print(f"[train_prod] phase A: 0..{resume_at}", flush=True)
    subprocess.run(_cli(root, out_dir, resume_at, False), check=True, cwd=REPO)
    ta = time.time() - t0
    print(f"[train_prod] phase A done in {ta / 60:.1f} min; "
          f"phase B: resume -> {total}", flush=True)
    subprocess.run(_cli(root, out_dir, total, True), check=True, cwd=REPO)
    wall = time.time() - t0

    result = {
        "condition": "flagship dims (atten 128 / fc 64), 512x512 crops, bs6, "
                     "selective remat, bf16, AdamW+cosine, real HIM loader + "
                     "packed infeed, mid-run checkpoint/resume at iter "
                     f"{resume_at}",
        "total_iters": total,
        "resume_at": resume_at,
        "wall_min": round(wall / 60, 1),
        **_parse_log(os.path.join(out_dir, "log_rank0.log")),
        "measured_at": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    with open(os.path.join(REPO, "output/train_prod.json"), "w") as f:
        json.dump(result, f, indent=1)
    lc, vs = result["loss_curve"], result["val_series"]
    print(f"[train_prod] {len(lc)} log points, {len(vs)} vals; "
          f"loss {lc[0]['total']:.3f} -> {lc[-1]['total']:.3f}; "
          f"val MAD {vs[0].get('MAD')} -> {vs[-1].get('MAD')}"
          if lc and vs else "[train_prod] WARNING: empty parse", flush=True)
    print("[train_prod] wrote output/train_prod.json", flush=True)


if __name__ == "__main__":
    main()
