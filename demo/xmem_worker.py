"""XMem video mask-propagation worker (subprocess side of ``XMemPropagator``).

Mirrors the reference's ``demo/xmem_processor.py:1-131`` — same XMem config
dict, first-frame one-hot seeding, per-frame ``InferenceCore.step`` streaming,
and MAX_SIZE=640 downscale-for-inference/upscale-for-output — but speaks the
demo's file-exchange protocol instead of re-extracting a video with ffmpeg
(the parent demo already has frames on disk):

    exchange/frames/<name>.png     input frames (RGB)
    exchange/first_mask.png        first-frame label map (0=bg, 1..n=instance)
    exchange/masks/<name>.png      OUTPUT per-frame label maps

Run inside the environment that has the XMem repo + torch-with-GPU (or CPU):

    python xmem_worker.py EXCHANGE_DIR XMEM_REPO_DIR XMEM_WEIGHTS_PTH
"""

import os
import sys


def main():
    exchange, xmem_dir, weights = sys.argv[1], sys.argv[2], sys.argv[3]
    sys.path.insert(0, xmem_dir)

    import cv2
    import numpy as np
    import torch
    from model.network import XMem
    from inference.inference_core import InferenceCore
    from inference.interact.interactive_utils import (
        image_to_torch, index_numpy_to_one_hot_torch, torch_prob_to_numpy_mask)

    # reference demo/xmem_processor.py:21-31 — verbatim inference config
    config = {
        "top_k": 30,
        "mem_every": 5,
        "deep_update_every": -1,
        "enable_long_term": True,
        "enable_long_term_count_usage": True,
        "num_prototypes": 128,
        "min_mid_term_frames": 5,
        "max_mid_term_frames": 10,
        "max_long_term_elements": 10000,
    }
    MAX_SIZE = 640  # reference :15

    device = "cuda" if torch.cuda.is_available() else "cpu"
    network = XMem(config, weights, map_location=torch.device(device)).eval().to(device)

    frames_dir = os.path.join(exchange, "frames")
    out_dir = os.path.join(exchange, "masks")
    os.makedirs(out_dir, exist_ok=True)
    frame_names = sorted(os.listdir(frames_dir))
    first_mask = cv2.imread(os.path.join(exchange, "first_mask.png"),
                            cv2.IMREAD_GRAYSCALE)
    n_objects = int(first_mask.max())

    processor = InferenceCore(network, config=config)
    processor.set_all_labels(range(1, n_objects + 1))  # reference :88

    frame0 = cv2.imread(os.path.join(frames_dir, frame_names[0]))
    oh, ow = frame0.shape[:2]
    ratio = min(1.0, MAX_SIZE / max(oh, ow))  # reference :95-97

    with torch.no_grad():  # reference :100-128
        for idx, name in enumerate(frame_names):
            frame = cv2.imread(os.path.join(frames_dir, name))
            if ratio < 1.0:
                frame = cv2.resize(frame, (0, 0), fx=ratio, fy=ratio)
            frame_torch, _ = image_to_torch(frame, device=device)
            if idx == 0:
                m = cv2.resize(first_mask, (frame.shape[1], frame.shape[0]),
                               interpolation=cv2.INTER_NEAREST)
                mask_torch = index_numpy_to_one_hot_torch(m, n_objects + 1).to(device)
                prediction = processor.step(frame_torch, mask_torch[1:])
            else:
                prediction = processor.step(frame_torch)
            label = torch_prob_to_numpy_mask(prediction)
            label = cv2.resize(label.astype(np.uint8), (ow, oh),
                               interpolation=cv2.INTER_NEAREST)
            cv2.imwrite(os.path.join(out_dir, os.path.splitext(name)[0] + ".png"),
                        label)
    print(f"xmem_worker: wrote {len(frame_names)} label maps to {out_dir}")


if __name__ == "__main__":
    main()
