"""Build an on-disk synthetic V-HIM-style video dataset for end-to-end runs.

The real V-HIM recipe (reference ``tools/synthesize_video_him.py:47-119``)
composites 2-3 human foreground clips over background videos with
occlusion-aware alpha recomputation; its source data (VM108/VideoMatte240K,
DVM backgrounds) is not available offline. This tool substitutes procedurally
generated human-like figures (``tools/cap_quality.py:procedural_alpha``) that
MOVE: each instance gets a per-frame affine trajectory (translation + slow
rotation + scale drift), its foreground texture is warped with the same
transform so texture tracks the silhouette, occlusion is recomputed
front-to-back per frame, and the background pans. The output follows the
exact layout ``maggie_tpu/data/vim.py`` consumes (reference
``maggie/dataloader/vim.py:36-63``):

  train: ROOT/<split>/fgr/<video>/<fff>.jpg
         ROOT/<split>/pha/<video>/<fff>/<j>.png
  eval:  same + ROOT/<split>/xmem/<video>/<fff>/<j>.png (degraded guidance
         masks standing in for XMem propagation output)

Eval guidance masks are degraded per frame with a temporally *correlated*
morphology kernel (one erode/dilate choice per video, like a propagator's
systematic bias) so the sequence looks like tracker output, not iid noise.

Usage: python tools/make_synthetic_vim.py ROOT [n_train] [n_eval] [T] [H] [W]
       (defaults: 20 train videos, 6 eval videos, 16 frames, 288x512)
"""

from __future__ import annotations

import os
import sys

import cv2
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

from cap_quality import procedural_alpha  # noqa: E402
from make_synthetic_him import _degraded_mask, _texture  # noqa: E402


def _trajectory(rs: np.random.RandomState, n_frames: int):
    """Per-frame 2x3 affine matrices: smooth walk in tx/ty, slow rotation and
    scale drift around the canvas center (filled in by the caller)."""
    vx = rs.uniform(-4.0, 4.0)
    vy = rs.uniform(-2.5, 2.5)
    vrot = rs.uniform(-0.6, 0.6)          # degrees / frame
    vscale = rs.uniform(-0.004, 0.004)    # relative / frame
    mats = []
    tx = ty = rot = 0.0
    scale = 1.0
    for _ in range(n_frames):
        mats.append((tx, ty, rot, scale))
        tx += vx + rs.uniform(-0.7, 0.7)
        ty += vy + rs.uniform(-0.7, 0.7)
        rot += vrot
        scale = float(np.clip(scale + vscale, 0.85, 1.15))
    return mats


def _warp(img: np.ndarray, params, h: int, w: int) -> np.ndarray:
    tx, ty, rot, scale = params
    m = cv2.getRotationMatrix2D((w / 2.0, h / 2.0), rot, scale)
    m[0, 2] += tx
    m[1, 2] += ty
    return cv2.warpAffine(img, m, (w, h), flags=cv2.INTER_LINEAR,
                          borderMode=cv2.BORDER_CONSTANT, borderValue=0)


def _compose_video(seed: int, n_frames: int, h: int, w: int):
    """Returns (frames uint8 (T,h,w,3), alphas float (T,n_i,h,w)).

    alphas are occlusion-disjoint front-to-back (j=0 front) per frame, the
    same semantics as the image synthesizer (synthesize_image_him.py:55-89)."""
    rs = np.random.RandomState(seed)
    n_i = rs.randint(2, 4)
    # raw (pre-occlusion) silhouettes: one figure per call so no cross-instance
    # occlusion is baked in; motion re-derives occlusion per frame
    raw = [procedural_alpha(seed * 131 + j, h, w, n_i=1)[0] for j in range(n_i)]
    fgs = [_texture(rs, h, w, rs.choice([4, 8, 16]),
                    rs.uniform(30, 230, size=3)).astype(np.float32)
           for _ in range(n_i)]
    trajs = [_trajectory(rs, n_frames) for _ in range(n_i)]
    bg = _texture(rs, h + 32, w + 32, rs.choice([16, 32, 64]),
                  rs.uniform(40, 220, size=3)).astype(np.float32)
    bvx, bvy = rs.randint(-2, 3), rs.randint(-2, 3)

    frames = np.empty((n_frames, h, w, 3), np.uint8)
    alphas = np.empty((n_frames, n_i, h, w), np.float32)
    for t in range(n_frames):
        ox = int(np.clip(16 + bvx * t, 0, 32))
        oy = int(np.clip(16 + bvy * t, 0, 32))
        img = bg[oy:oy + h, ox:ox + w].copy()
        warped = [np.clip(_warp(raw[j], trajs[j][t], h, w), 0.0, 1.0)
                  for j in range(n_i)]
        acc = np.zeros((h, w), np.float32)
        for j in range(n_i):
            a = warped[j] * (1.0 - acc)
            acc = acc + a
            alphas[t, j] = a
            fg_t = _warp(fgs[j], trajs[j][t], h, w)
            img = a[..., None] * fg_t + (1.0 - a[..., None]) * img
        frames[t] = np.clip(img, 0, 255).astype(np.uint8)
    return frames, alphas


def _write_video(root: str, split: str, name: str, frames: np.ndarray,
                 alphas: np.ndarray, mask_dir: str | None,
                 rs: np.random.RandomState) -> None:
    n_frames, n_i = alphas.shape[:2]
    fdir = os.path.join(root, split, "fgr", name)
    os.makedirs(fdir, exist_ok=True)
    # one systematic degradation per video: trackers drift consistently
    mask_seed = rs.randint(0, 2 ** 31 - 1) if mask_dir else 0
    for t in range(n_frames):
        stem = f"{t:05d}"
        cv2.imwrite(os.path.join(fdir, stem + ".jpg"), frames[t][..., ::-1],
                    [cv2.IMWRITE_JPEG_QUALITY, 95])
        adir = os.path.join(root, split, "pha", name, stem)
        os.makedirs(adir, exist_ok=True)
        for j in range(n_i):
            a8 = (alphas[t, j] * 255).astype(np.uint8)
            cv2.imwrite(os.path.join(adir, f"{j:02d}.png"), a8)
            if mask_dir:
                mdir = os.path.join(root, split, mask_dir, name, stem)
                os.makedirs(mdir, exist_ok=True)
                # per-video fixed seed + per-frame offset keeps the erode/dilate
                # direction stable across the clip (propagator-like bias)
                mrs = np.random.RandomState((mask_seed + j) % (2 ** 31 - 1))
                cv2.imwrite(os.path.join(mdir, f"{j:02d}.png"),
                            _degraded_mask(a8, mrs))


def build(root: str, n_train: int = 20, n_eval: int = 6, n_frames: int = 16,
          h: int = 288, w: int = 512) -> None:
    rs = np.random.RandomState(77)
    for i in range(n_train):
        frames, alphas = _compose_video(5000 + i, n_frames, h, w)
        _write_video(root, "train", f"vtr{i:04d}", frames, alphas, None, rs)
    for i in range(n_eval):
        frames, alphas = _compose_video(800000 + i, n_frames, h, w)
        _write_video(root, "eval", f"vev{i:04d}", frames, alphas, "xmem", rs)
    print(f"wrote {n_train} train + {n_eval} eval videos "
          f"({n_frames} frames, {h}x{w}) under {root}")


if __name__ == "__main__":
    args = sys.argv[1:]
    root = args[0] if args else "data/synthetic_vim"
    ints = [int(a) for a in args[1:]]
    build(root, *ints)
