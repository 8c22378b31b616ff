"""Inference demo: image or video instance matting from files.

A CLI counterpart of the reference Gradio app (``demo/app.py``,
``demo/maggie_predictor.py``). The reference wires external segmenters
(ONNX MaskRCNN for instance proposal, XMem/SAM2 for video mask propagation) in
front of MaGGIe; those stay out of scope on this box (no gradio/onnxruntime and no
downloadable weights) — this demo takes the guidance masks as inputs, exactly what
the segmenters would produce, and runs the TPU model.

Usage:
  # image: one RGB + one binary PNG per instance
  python demo/predict.py image --weights w.npz --image img.jpg \
      --masks m0.png m1.png --out out_dir
  # video: frame directory + per-frame mask directories (inst-indexed PNGs)
  python demo/predict.py video --weights w.npz --frames frames_dir \
      --masks masks_dir --out out_dir
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from maggie_tpu.config import load_config  # noqa: E402
from maggie_tpu.data import transforms as T  # noqa: E402
from maggie_tpu.utils.postprocess import reverse_transform  # noqa: E402

FRAME_TF = T.Compose([
    T.ResizeShort(576, transform_alphas=False),
    T.PaddingMultiplyBy(64, transform_alphas=False),
    T.Stack(),
    T.ToNumpy(),
    T.Normalize(),
])


def preprocess(frames: list[Image.Image], inst_masks: list[list[np.ndarray]]):
    """frames: list of PIL images; inst_masks: per-frame list of HxW uint8 masks."""
    flat_masks = [m for per_frame in inst_masks for m in per_frame]
    d = {
        "frames": [np.array(f.convert("RGB")) for f in frames],
        "alphas": list(flat_masks),
        "masks": list(flat_masks),
    }
    # Load() is skipped (already arrays); run the rest
    for t in FRAME_TF.transforms:
        d.setdefault("transform_info", [])
        d = t(d)
    import jax.numpy as jnp
    batch = {
        "image": jnp.asarray(d["frames"][None]),
        "mask": jnp.asarray(d["masks"][None].astype(np.float32) / 255.0),
    }
    return batch, d["transform_info"]


def build(cfg_path: str, weights: str, video: bool):
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    from maggie_tpu.models import build_model
    from maggie_tpu.utils.checkpoint import load_model_weights
    cfg = load_config(cfg_path)
    cfg.model.weights = weights
    model = build_model(cfg.model)
    variables = load_model_weights(model, cfg)
    return model, variables


def save_alphas(alpha: np.ndarray, out_dir: str, frame_names: list[str]):
    os.makedirs(out_dir, exist_ok=True)
    for t in range(alpha.shape[1]):
        for i in range(alpha.shape[2]):
            d = os.path.join(out_dir, os.path.splitext(frame_names[t])[0])
            os.makedirs(d, exist_ok=True)
            Image.fromarray((alpha[0, t, i] * 255).astype(np.uint8)).save(
                os.path.join(d, f"{i:02d}.png"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["image", "video"])
    ap.add_argument("--config", default=None)
    ap.add_argument("--weights", default="")
    ap.add_argument("--image", default=None)
    ap.add_argument("--frames", default=None)
    ap.add_argument("--masks", nargs="+", required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    if args.mode == "image":
        cfgp = args.config or "configs/maggie_image.yaml"
        model, variables = build(cfgp, args.weights, video=False)
        frame = Image.open(args.image)
        masks = [np.array(Image.open(m).convert("L")) for m in args.masks]
        batch, tinfo = preprocess([frame], [masks])
        out = model.apply(variables, batch, train=False)
        alpha = reverse_transform(np.asarray(out["refined_masks"]), tinfo)
        alpha[alpha <= 1 / 255] = 0.0
        alpha[alpha >= 254 / 255] = 1.0
        save_alphas(alpha, args.out, [os.path.basename(args.image)])
        print(f"Wrote {alpha.shape[2]} instance mattes to {args.out}")
    else:
        cfgp = args.config or "configs/maggie_video.yaml"
        model, variables = build(cfgp, args.weights, video=True)
        frame_names = sorted(os.listdir(args.frames))
        mask_root = args.masks[0]
        prev_pred = None
        os.makedirs(args.out, exist_ok=True)
        # streaming 3-frame windows with overlap 2 (engine/test.py semantics)
        for start in range(0, max(len(frame_names) - 2, 1)):
            clip = frame_names[start:start + 3]
            frames = [Image.open(os.path.join(args.frames, f)) for f in clip]
            inst_masks = []
            for f in clip:
                mdir = os.path.join(mask_root, os.path.splitext(f)[0])
                inst_masks.append([np.array(Image.open(os.path.join(mdir, m)).convert("L"))
                                   for m in sorted(os.listdir(mdir))])
            batch, tinfo = preprocess(frames, inst_masks)
            out = model.apply(variables, batch, train=False, prev_pred=prev_pred)
            refined = out["refined_masks"]
            prev_pred = refined[:, 1]
            alpha = reverse_transform(np.asarray(refined), tinfo)
            alpha[alpha <= 1 / 255] = 0.0
            alpha[alpha >= 254 / 255] = 1.0
            # write t-1 (first window also writes t, t+1 at the end)
            keep = range(3) if start == max(len(frame_names) - 3, 0) else [0]
            for t in keep:
                save_alphas(alpha[:, t:t + 1], args.out, [clip[t]])
        print(f"Wrote mattes to {args.out}")


if __name__ == "__main__":
    main()
