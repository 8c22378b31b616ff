"""M-HIM2K guidance-mask generation.

Counterpart of the reference's detectron2 pipeline
(``/root/reference/tools/gen_mask/image_demo_newbaselines.py:1-242`` +
``gen_mask_all.sh``): for every HIM2K image it emits one binary guidance mask per
instance at ``<root>/masks_<name>/<subset>/<image>/%02d.png`` — the layout both the
reference and ``maggie_tpu.data.him.HIMDataset`` consume at eval time.

Two segmenter backends:

- ``alpha`` (default, fully offline): derives masks from the GT instance alphas and
  degrades them to detector quality. Binarize at 0.5 (the reference's
  ``GenMaskFromAlpha``, ``transforms.py:466-478``), then per-variant corruption:
  down-up resampling (``DownUpMask`` semantics, ``transforms.py:480-497``) and/or
  the boundary-perturbation walk (``transforms.py:599-717``). The same post-filter
  as the detectron2 script applies: masks covering <2% of the image are dropped
  (``image_demo_newbaselines.py:108-113``).
- ``detectron2``: the reference's real recipe needs detectron2 + COCO MaskRCNN
  weights, neither of which is available on an offline box; this backend raises
  with a pointer to README.md, which records the exact 10-variant recipe.

Usage:
  python tools/gen_mask/gen_mask.py --root data/HIM2K --subsets natural comp \
      --variant perturb --name r50_c4_3x_sim --seed 0
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

import cv2
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from maggie_tpu.data.transforms import ModifyMaskBoundary  # noqa: E402

# Degradation recipes emulating detector families of decreasing quality:
# ratio = DownUpMask down-up factor (1.0 = off), perturb = boundary walk on/off.
VARIANTS = {
    "clean": dict(ratio=1.0, perturb=False),     # GenMaskFromAlpha only
    "downup": dict(ratio=0.125, perturb=False),  # os8-quality masks (the train-time corruption)
    "perturb": dict(ratio=1.0, perturb=True),    # boundary-walk only
    "full": dict(ratio=0.25, perturb=True),      # both — the weakest-detector stand-in
}

MIN_AREA_RATIO = 0.02  # image_demo_newbaselines.py:111-112
MIN_SCORE_NOTE = 0.7   # detectron2 backend keeps person masks with score>0.7 (:108-110)


def _degrade(mask: np.ndarray, ratio: float, perturb: bool, rs: np.random.RandomState) -> np.ndarray:
    if ratio < 1.0:
        h, w = mask.shape[:2]
        small = cv2.resize(mask, (0, 0), fx=ratio, fy=ratio, interpolation=cv2.INTER_LINEAR)
        mask = cv2.resize(small, (w, h), interpolation=cv2.INTER_LINEAR)
        mask = (mask > 127).astype(np.uint8) * 255
    if perturb:
        mod = ModifyMaskBoundary(rs, p=0.0)  # p is the KEEP-unchanged probability
        mask = mod._modify(mask)
        mask = (mask > 127).astype(np.uint8) * 255
    return mask


def gen_alpha_backend(root: str, subsets: list[str], name: str, variant: str,
                      alpha_dir: str = "alphas", seed: int = 0) -> int:
    spec = VARIANTS[variant]
    rs = np.random.RandomState(seed)
    n_written = 0
    for subset in subsets:
        images = sorted(glob.glob(os.path.join(root, "images", subset, "*.jpg")))
        if not images:  # also accept the reference's flat layout images/<subset>/*.png
            images = sorted(glob.glob(os.path.join(root, "images", subset, "*.png")))
        for image in images:
            base = os.path.splitext(os.path.basename(image))[0]
            adir = os.path.join(root, alpha_dir, subset, base)
            alphas = sorted(glob.glob(os.path.join(adir, "*.png")))
            if not alphas:
                continue
            odir = os.path.join(root, f"masks_{name}", subset, base)
            os.makedirs(odir, exist_ok=True)
            idx = 0
            for apath in alphas:
                alpha = cv2.imread(apath, cv2.IMREAD_GRAYSCALE)
                if alpha is None:
                    continue
                mask = (alpha > 127).astype(np.uint8) * 255
                mask = _degrade(mask, spec["ratio"], spec["perturb"], rs)
                h, w = mask.shape[:2]
                if (mask > 0).sum() / float(h * w) < MIN_AREA_RATIO:
                    continue  # same area filter as the detectron2 script
                cv2.imwrite(os.path.join(odir, "%02d.png" % idx), mask)
                idx += 1
                n_written += 1
    return n_written


def gen_onnx_backend(root: str, subsets: list[str], name: str) -> int:
    """A REAL detector backend: the public MaskRCNN-10 ONNX model through
    ``demo/segmenters.MaskRCNNOnnxSegmenter`` (raises with its setup recipe if
    onnxruntime / the model file are missing). Same person-class + score>0.7
    selection and 2%-area filter as the reference's detectron2 script."""
    from PIL import Image
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", "demo"))
    from segmenters import MaskRCNNOnnxSegmenter, label_map_to_instances

    seg = MaskRCNNOnnxSegmenter(score_threshold=MIN_SCORE_NOTE)
    n_written = 0
    for subset in subsets:
        images = sorted(glob.glob(os.path.join(root, "images", subset, "*.jpg")))
        for image in images:
            base = os.path.splitext(os.path.basename(image))[0]
            _, label_map = seg.segment(Image.open(image).convert("RGB"))
            odir = os.path.join(root, f"masks_{name}", subset, base)
            os.makedirs(odir, exist_ok=True)
            idx = 0
            h, w = label_map.shape
            for m in label_map_to_instances(label_map):
                if (m > 0).sum() / float(h * w) < MIN_AREA_RATIO:
                    continue
                cv2.imwrite(os.path.join(odir, "%02d.png" % idx), m)
                idx += 1
                n_written += 1
    return n_written


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.split("\n", 1)[0])
    ap.add_argument("--root", required=True, help="HIM2K root (images/<subset>/, alphas/<subset>/)")
    ap.add_argument("--subsets", nargs="+", default=["natural", "comp"])
    ap.add_argument("--name", required=True, help="output suffix: masks_<name>/")
    ap.add_argument("--variant", default="perturb", choices=sorted(VARIANTS))
    ap.add_argument("--backend", default="alpha",
                    choices=["alpha", "onnx", "detectron2"])
    ap.add_argument("--alpha-dir", default="alphas")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    if args.backend == "detectron2":
        raise SystemExit(
            "The detectron2 backend needs the detectron2 package and COCO MaskRCNN "
            "weights (neither installable offline). Run the recipe in "
            "tools/gen_mask/README.md inside a detectron2 checkout; the output layout "
            "it produces is identical to this tool's. For a real detector that "
            "works with one pip install + one file, use --backend onnx.")

    if args.backend == "onnx":
        n = gen_onnx_backend(args.root, args.subsets, args.name)
    else:
        n = gen_alpha_backend(args.root, args.subsets, args.name, args.variant,
                              args.alpha_dir, args.seed)
    print(f"wrote {n} masks under {args.root}/masks_{args.name}/")


if __name__ == "__main__":
    main()
