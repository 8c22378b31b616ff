"""Build an on-disk synthetic I-HIM-style dataset for end-to-end training runs.

The real I-HIM50K recipe (reference ``tools/synthesize_image_him.py:55-89``)
composites 2-5 human foregrounds over backgrounds with occlusion-aware alpha
recomputation; its source data (HHM crops, BG-20K) is not available offline.
This tool substitutes procedurally generated human-like foreground alphas
(``tools/cap_quality.py:procedural_alpha``: silhouette ellipse unions, 1-4 px
soft boundaries, partial-alpha hair strands, front-to-back occlusion) and
textured foreground/background colors, writing BOTH dataset layouts
``maggie_tpu/data/him.py`` consumes:

  train:  root/<split>/images/*.jpg + root/<split>/alphas/<image>/<j>.png
  eval:   root/images/<split>/*.jpg + root/alphas/<split>/<image>/<j>.png
          + root/masks/<split>/<image>/<j>.png   (degraded guidance masks)

Guidance masks are degraded the way M-HIM2K masks are degraded relative to
ground truth (binarize -> 8x down/up resample, the reference's DownUpMask
eval fallback, ``dataloader/transforms.py``), so eval measures refinement of
imperfect guidance — MaGGIe's actual task.

Usage: python tools/make_synthetic_him.py ROOT [n_train] [n_eval] [H] [W]
"""

from __future__ import annotations

import os
import sys

import cv2
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

from cap_quality import procedural_alpha  # noqa: E402


def _texture(rs: np.random.RandomState, h: int, w: int,
             scale: int, base: np.ndarray) -> np.ndarray:
    """(h, w, 3) uint8 smooth colored noise around a base color."""
    small = rs.rand(max(h // scale, 2), max(w // scale, 2), 3).astype(np.float32)
    tex = cv2.resize(small, (w, h), interpolation=cv2.INTER_CUBIC)
    out = np.clip(base[None, None] * (0.55 + 0.9 * tex), 0, 255)
    return out.astype(np.uint8)


def _degraded_mask(alpha: np.ndarray, rs: np.random.RandomState) -> np.ndarray:
    """Binarize + 8x down/up (nearest) + random erode/dilate: a cheap stand-in
    for detector-quality masks."""
    m = (alpha > 127).astype(np.uint8) * 255
    h, w = m.shape
    m = cv2.resize(m, (max(w // 8, 1), max(h // 8, 1)),
                   interpolation=cv2.INTER_NEAREST)
    m = cv2.resize(m, (w, h), interpolation=cv2.INTER_NEAREST)
    k = rs.choice([3, 5, 7])
    se = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (k, k))
    m = cv2.dilate(m, se) if rs.rand() < 0.5 else cv2.erode(m, se)
    return m


def _compose(seed: int, h: int, w: int):
    """Returns (image uint8 (h,w,3), alphas float (n,h,w))."""
    rs = np.random.RandomState(seed)
    alphas = procedural_alpha(seed, h, w)
    n = alphas.shape[0]
    bg = _texture(rs, h, w, rs.choice([16, 32, 64]),
                  rs.uniform(40, 220, size=3))
    img = bg.astype(np.float32)
    # front-to-back: j=0 front; alphas are already occlusion-disjoint
    for j in range(n):
        fg = _texture(rs, h, w, rs.choice([4, 8, 16]),
                      rs.uniform(30, 230, size=3)).astype(np.float32)
        a = alphas[j][..., None]
        img = a * fg + (1.0 - a) * img
    return np.clip(img, 0, 255).astype(np.uint8), alphas


def build(root: str, n_train: int = 400, n_eval: int = 24,
          h: int = 576, w: int = 768) -> None:
    rs = np.random.RandomState(99)
    for i in range(n_train):
        img, alphas = _compose(1000 + i, h, w)
        name = f"tr{i:05d}"
        idir = os.path.join(root, "tr", "images")
        os.makedirs(idir, exist_ok=True)
        cv2.imwrite(os.path.join(idir, name + ".jpg"), img[..., ::-1],
                    [cv2.IMWRITE_JPEG_QUALITY, 95])
        adir = os.path.join(root, "tr", "alphas", name)
        os.makedirs(adir, exist_ok=True)
        for j in range(alphas.shape[0]):
            cv2.imwrite(os.path.join(adir, f"{j:02d}.png"),
                        (alphas[j] * 255).astype(np.uint8))
    for i in range(n_eval):
        img, alphas = _compose(900000 + i, h, w)
        name = f"ev{i:05d}"
        idir = os.path.join(root, "images", "natural")
        os.makedirs(idir, exist_ok=True)
        cv2.imwrite(os.path.join(idir, name + ".jpg"), img[..., ::-1],
                    [cv2.IMWRITE_JPEG_QUALITY, 95])
        for j in range(alphas.shape[0]):
            a8 = (alphas[j] * 255).astype(np.uint8)
            adir = os.path.join(root, "alphas", "natural", name)
            mdir = os.path.join(root, "masks", "natural", name)
            os.makedirs(adir, exist_ok=True)
            os.makedirs(mdir, exist_ok=True)
            cv2.imwrite(os.path.join(adir, f"{j:02d}.png"), a8)
            cv2.imwrite(os.path.join(mdir, f"{j:02d}.png"),
                        _degraded_mask(a8, rs))
    print(f"wrote {n_train} train + {n_eval} eval images under {root}")


if __name__ == "__main__":
    args = sys.argv[1:]
    root = args[0] if args else "data/synthetic_him"
    ints = [int(a) for a in args[1:]]
    build(root, *ints)
