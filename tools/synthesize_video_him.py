"""V-HIM2K5 / V-HIM60 synthesizer (reference ``tools/synthesize_video_him.py``).

Composites 2-5 foreground human videos over image/video backgrounds at three
difficulty levels (easy/medium/hard: placement randomness, scale jitter and
occlusion thresholds; reference ``:30-201``), with occlusion-aware alpha rewrites
and per-level rejection of too-much/too-little occlusion.

Usage:
  python tools/synthesize_video_him.py --split train --data-dir <VHM> --out-dir <out>
"""

from __future__ import annotations

import argparse
import os
import shutil
from multiprocessing import Pool

import cv2
import numpy as np
from PIL import Image

_CTX: dict = {}
CLIP_LEN = 30


def _load_alpha_paths(video_name: str) -> list[str]:
    data_dir = _CTX["data_dir"]
    alpha_dir = os.path.join(data_dir, video_name).replace("/fgr/", "/pha/")
    if not os.path.exists(alpha_dir):
        alpha_dir = os.path.join(data_dir, video_name)
    return [os.path.join(alpha_dir, p) for p in sorted(os.listdir(alpha_dir))]


def gen_video(args: tuple[str, str]):
    out_name, level = args
    data_dir, out_dir = _CTX["data_dir"], _CTX["out_dir"]
    valid_videos, bg_files, bg_videos = _CTX["valid_videos"], _CTX["bg_files"], _CTX["bg_videos"]
    rs = np.random.RandomState(int(out_name))

    n_vid = rs.randint(2, 5)
    if level == "easy":
        n_vid = min(n_vid, 3)
    video_names = rs.choice(valid_videos, n_vid, replace=False)

    if rs.rand() < 0.5 and bg_files:
        while True:
            bg_path = os.path.join(data_dir, rs.choice(bg_files))
            bg = cv2.imread(bg_path)[:, :, ::-1]
            if bg.shape[1] > bg.shape[0]:
                break
        bg_paths = [bg_path]
    else:
        bg_name = rs.choice(bg_videos)
        bg_paths = [os.path.join(data_dir, bg_name, p)
                    for p in sorted(os.listdir(os.path.join(data_dir, bg_name)))]
        bg = cv2.imread(bg_paths[0])[:, :, ::-1]

    n_frames = [len(os.listdir(os.path.join(data_dir, v))) for v in video_names]
    clip = min(min(n_frames), CLIP_LEN)

    fg_bboxes, start_frames = [], []
    for v in video_names:
        alpha_paths = _load_alpha_paths(v)
        start = 0 if len(alpha_paths) == clip else rs.randint(0, len(alpha_paths) - clip)
        start_frames.append(start)
        x1, y1, x2, y2 = 10 ** 6, 10 ** 6, 0, 0
        for ap in alpha_paths[start:start + clip]:
            a = np.array(Image.open(ap).convert("L")).astype(np.uint8)
            bx, by, bw, bh = cv2.boundingRect(a)
            x1, y1 = min(x1, bx), min(y1, by)
            x2, y2 = max(x2, bx + bw), max(y2, by + bh)
        fg_bboxes.append((x1, y1, x2 - x1, y2 - y1))

    h, w = bg.shape[:2]
    w_over_h = [b[2] * 1.0 / max(b[3], 1) for b in fg_bboxes]
    ratios = []
    for box, woh in zip(fg_bboxes, w_over_h):
        target_w = w * (woh / sum(w_over_h))
        ratio = target_w / max(box[2], 1)
        if level == "medium":
            ratio *= rs.uniform(1.0, 1.5)
        elif level == "hard":
            ratio *= rs.uniform(1.0, 2.0)
        if ratio * box[3] > h:
            ratio = h / box[3] * rs.uniform(0.8, 1.0)
        ratios.append(ratio)

    x = 0
    comp_bboxes = []
    for box, ratio in zip(fg_bboxes, ratios):
        nh, nw = int(box[3] * ratio), int(box[2] * ratio)
        if level == "easy":
            x1 = x
        else:
            x1 = x + rs.randint(0, w // 2) * rs.choice([-1, 1])
        x1 = max(min(x1, w - nw), 0)
        comp_bboxes.append((x1, h - nh, nw, nh))
        x = x1 + nw

    start_bg = rs.randint(0, len(bg_paths) - 1) if len(bg_paths) > 1 else 0
    max_occ = 0.0

    def reject():
        shutil.rmtree(os.path.join(out_dir, "fgr", out_name), ignore_errors=True)
        shutil.rmtree(os.path.join(out_dir, "pha", out_name), ignore_errors=True)

    for i in range(clip):
        frame = Image.open(bg_paths[min(start_bg + i, len(bg_paths) - 1)]).convert("RGB")
        all_alphas = []
        for vi, v in enumerate(video_names):
            alpha_names = _load_alpha_paths(v)[start_frames[vi]:start_frames[vi] + clip]
            an = alpha_names[i]
            if "/fgr/" in an:
                alpha = Image.fromarray(np.array(Image.open(an))[:, :, 3])
            else:
                alpha = Image.open(an).convert("L")
            fgr_names = sorted(os.listdir(os.path.join(data_dir, v)))[start_frames[vi]:start_frames[vi] + clip]
            fgr = Image.open(os.path.join(data_dir, v, fgr_names[i])).convert("RGB")

            box, ratio = fg_bboxes[vi], ratios[vi]
            nh, nw = int(box[3] * ratio), int(box[2] * ratio)
            alpha = alpha.crop((box[0], box[1], box[0] + box[2], box[1] + box[3])).resize((nw, nh), Image.BILINEAR)
            fgr = fgr.crop((box[0], box[1], box[0] + box[2], box[1] + box[3])).resize((nw, nh), Image.BILINEAR)
            x1, y1 = comp_bboxes[vi][0], comp_bboxes[vi][1]
            frame.paste(fgr, (x1, y1), alpha)
            canvas = Image.new("L", (w, h), 0)
            canvas.paste(alpha, (x1, y1))
            all_alphas.append(np.array(canvas) / 255.0)
            for j in range(len(all_alphas) - 1):
                new_j = all_alphas[j] * (1 - all_alphas[-1])
                if all_alphas[j].sum() > 0:
                    occ = 1.0 - new_j.sum() / (all_alphas[j].sum() + 1e-7)
                    if (occ > 0.3 and level == "medium") or (occ > 0.85 and level == "hard"):
                        reject()
                        return
                    max_occ = max(max_occ, occ)
                all_alphas[j] = new_j

        fp = os.path.join(out_dir, "fgr", out_name, f"{i:05d}.jpg")
        os.makedirs(os.path.dirname(fp), exist_ok=True)
        frame.save(fp)
        for ai, a in enumerate(all_alphas):
            ap = os.path.join(out_dir, "pha", out_name, f"{i:05d}", f"{ai:02d}.png")
            os.makedirs(os.path.dirname(ap), exist_ok=True)
            Image.fromarray((a * 255).astype("uint8")).save(ap)

    if (max_occ < 0.05 and level == "medium") or (max_occ < 0.5 and level == "hard"):
        reject()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--split", type=str, default="train")
    ap.add_argument("--data-dir", type=str, required=True)
    ap.add_argument("--out-dir", type=str, required=True)
    ap.add_argument("--n-workers", type=int, default=8)
    args = ap.parse_args()

    valid_videos, bg_files, bg_videos = [], [], []
    with open(os.path.join(args.data_dir, f"fg_{args.split}.txt")) as f:
        valid_videos = [l.strip() for l in f if l.strip()]
    with open(os.path.join(args.data_dir, f"bg_{args.split}.txt")) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            (bg_files if line.endswith(".jpg") else bg_videos).append(line)

    _CTX.update(data_dir=args.data_dir, out_dir=args.out_dir,
                valid_videos=valid_videos, bg_files=bg_files, bg_videos=bg_videos)

    # the reference's schedule (:230-304)
    if args.split == "train":
        jobs = ([(f"{i:05d}", "easy") for i in range(0, 500)]
                + [(f"{i:05d}", "medium") for i in range(500, 1500)]
                + [(f"{i:05d}", "hard") for i in range(1500, 3500)]
                + [(f"{i:05d}", "medium") for i in range(3500, 9500)])
    else:
        jobs = ([(f"{i:05d}", "easy") for i in range(51)]
                + [(f"{i:05d}", "medium") for i in range(29, 222)]
                + [(f"{i:05d}", "hard") for i in range(2, 81)])

    if args.n_workers <= 1:
        for j in jobs:
            gen_video(j)
    else:
        with Pool(args.n_workers) as p:
            for _ in p.imap_unordered(gen_video, jobs):
                pass


if __name__ == "__main__":
    main()
