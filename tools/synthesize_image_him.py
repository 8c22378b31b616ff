"""I-HIM50K synthesizer (reference ``tools/synthesize_image_him.py``).

Composites 2-5 HHM foreground humans onto BG-20K backgrounds with occlusion-aware
alpha recomputation (alpha_j *= (1 - alpha_i) for earlier instances) and a >= 0.7
visibility-ratio rejection test (reference ``:55-89``).

Usage:
  python tools/synthesize_image_him.py --image-root <HHM/images> --bg-root <BG20K> \
      --output_dir <out> [--max-num-images 50000] [--n-workers N] \
      [--invalid-names invalid_him.txt]
"""

from __future__ import annotations

import argparse
import os
from multiprocessing import Pool

import cv2
import numpy as np
from PIL import Image

_CTX: dict = {}


def generate_image(sample_id: int):
    valid_fg = _CTX["valid_fg"]
    bg_paths = _CTX["bg_paths"]
    out = _CTX["output_dir"]
    random = np.random.RandomState(sample_id)

    fg_paths = random.choice(valid_fg, size=(random.randint(2, 5),), replace=False)
    alpha_paths = [p.replace("images", "alphas").replace(".jpg", ".png") for p in fg_paths]
    fgs = [Image.open(p).convert("RGB") for p in fg_paths]
    alphas = [Image.open(p).convert("L") for p in alpha_paths]

    # crop to the fg bounding box
    for i in range(len(fgs)):
        m = (np.array(alphas[i]) > 0).astype(np.uint8)
        coords = cv2.findNonZero(m)
        if coords is None:
            continue
        x, y, w, h = cv2.boundingRect(coords)
        fgs[i] = fgs[i].crop((x, y, x + w, y + h))
        alphas[i] = alphas[i].crop((x, y, x + w, y + h))

    bg = Image.open(random.choice(bg_paths)).convert("RGB")
    ori_bg = bg.copy()
    tw, th = bg.size

    for i in range(len(fgs)):
        scale = random.uniform(0.5, 0.9) * th / fgs[i].height
        fgs[i] = fgs[i].resize((max(int(fgs[i].width * scale), 1), max(int(fgs[i].height * scale), 1)))
        alphas[i] = alphas[i].resize(fgs[i].size)

    final_alpha = np.zeros((len(fgs), th, tw), np.float32)
    all_fgs: list = []
    for i in range(len(fgs)):
        ok = False
        new_alphas = final_alpha
        x = y = 0
        for _ in range(3):
            if tw - fgs[i].width <= 0 or th - fgs[i].height <= 0:
                break
            x = random.randint(0, tw - fgs[i].width)
            y = random.randint(0, th - fgs[i].height)
            new_alphas = final_alpha.copy()
            new_alphas[i, y:y + fgs[i].height, x:x + fgs[i].width] = np.array(alphas[i]) / 255.0
            # occlusion: earlier instances lose what the new one covers
            for j in range(i):
                new_alphas[j] *= (1 - new_alphas[i])
            new_areas = new_alphas.sum((1, 2))
            old_areas = final_alpha.sum((1, 2))
            ratio = new_areas / (old_areas + 1e-7)
            if np.any((old_areas > 0) & (ratio < 0.7)):  # visibility rejection
                continue
            ok = True
            break
        if not ok:
            all_fgs.append(None)
            continue
        bg.paste(fgs[i], (x, y), alphas[i])
        fg_canvas = Image.new("RGB", (tw, th), (0, 0, 0))
        fg_canvas.paste(fgs[i], (x, y))
        all_fgs.append(fg_canvas)
        final_alpha = new_alphas

    if final_alpha.sum() == 0:
        return
    bg.save(os.path.join(out, "images", f"{sample_id}.jpg"))
    ori_bg.save(os.path.join(out, "bg", f"{sample_id}.jpg"))
    idx = 0
    for j in range(len(final_alpha)):
        if final_alpha[j].sum() == 0:
            continue
        a = Image.fromarray((final_alpha[j] * 255).astype(np.uint8))
        apath = os.path.join(out, "alphas", str(sample_id), f"{idx}.png")
        os.makedirs(os.path.dirname(apath), exist_ok=True)
        a.save(apath)
        fpath = os.path.join(out, "fg", str(sample_id), f"{idx}.jpg")
        os.makedirs(os.path.dirname(fpath), exist_ok=True)
        all_fgs[j].save(fpath)
        idx += 1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image-root", type=str, required=True)
    ap.add_argument("--invalid-names", type=str, default="invalid_him.txt")
    ap.add_argument("--max-num-images", type=int, default=50000)
    ap.add_argument("--output_dir", type=str, required=True)
    ap.add_argument("--bg-root", type=str, required=True)
    ap.add_argument("--n-workers", type=int, default=8)
    args = ap.parse_args()

    invalid = set()
    if os.path.exists(args.invalid_names):
        with open(args.invalid_names) as f:
            invalid = {l.strip() for l in f}
    valid_fg = [os.path.join(args.image_root, n) for n in sorted(os.listdir(args.image_root))
                if n not in invalid]
    bg_paths = [os.path.join(args.bg_root, n) for n in sorted(os.listdir(args.bg_root))]

    for sub in ("images", "alphas", "bg", "fg"):
        os.makedirs(os.path.join(args.output_dir, sub), exist_ok=True)
    _CTX.update(valid_fg=valid_fg, bg_paths=bg_paths, output_dir=args.output_dir)

    if args.n_workers <= 1:
        for i in range(args.max_num_images):
            generate_image(i)
    else:
        with Pool(args.n_workers) as p:
            for _ in p.imap_unordered(generate_image, range(args.max_num_images)):
                pass


if __name__ == "__main__":
    main()
