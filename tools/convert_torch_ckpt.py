"""Convert a released MaGGIe torch checkpoint (.pth state_dict) to maggie_tpu npz.

Usage: python tools/convert_torch_ckpt.py in.pth out.npz [--video] [--decoder D]

Key-mapping rules: see maggie_tpu/utils/convert_torch.py (the implementation;
moved there so the package can load torch checkpoints directly — this file is
the CLI and a compatibility re-export).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from maggie_tpu.utils.convert_torch import (  # noqa: E402,F401
    Converter, conv_w, convT_w, convert, linear_w, spconv_w)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("input")
    ap.add_argument("output")
    ap.add_argument("--video", action="store_true")
    ap.add_argument("--n-block", type=int, default=2)
    ap.add_argument("--decoder", default="res_shortcut_inst_matt_spconv_22")
    args = ap.parse_args()
    import torch
    sd = torch.load(args.input, map_location="cpu")
    if "state_dict" in sd:
        sd = sd["state_dict"]
    sd = {k: v.numpy() for k, v in sd.items()}
    out = convert(sd, video=args.video, n_block=args.n_block, decoder=args.decoder)
    np.savez(args.output, **out)
    print(f"Wrote {len(out)} arrays to {args.output}")


if __name__ == "__main__":
    main()
