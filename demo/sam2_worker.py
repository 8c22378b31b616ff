"""SAM2/Samurai video mask-propagation worker (subprocess side of
``Sam2Propagator``).

Mirrors the reference's ``demo/samurai_processor.py:92-125`` — model config
selected from the checkpoint name, per-instance bounding-box prompts from the
first-frame label map, ``propagate_in_video`` streaming, per-object >0 mask
thresholding — over the demo's file-exchange protocol (the parent demo already
has frames on disk; the reference re-extracts a video with ffmpeg first):

    exchange/frames/<name>.png     input frames (RGB/JPEG ok)
    exchange/first_mask.png        first-frame label map (0=bg, 1..n=instance)
    exchange/masks/<name>.png      OUTPUT per-frame label maps

Run inside the environment that has the sam2/samurai package + checkpoint:

    python sam2_worker.py EXCHANGE_DIR SAM2_REPO_DIR SAM2_CHECKPOINT
"""

import os
import sys


def determine_model_cfg(model_path):
    # reference demo/samurai_processor.py:31-41
    if "large" in model_path:
        return "configs/samurai/sam2.1_hiera_l.yaml"
    elif "base_plus" in model_path:
        return "configs/samurai/sam2.1_hiera_b+.yaml"
    elif "small" in model_path:
        return "configs/samurai/sam2.1_hiera_s.yaml"
    elif "tiny" in model_path:
        return "configs/samurai/sam2.1_hiera_t.yaml"
    raise ValueError("Unknown model size in path!")


def main():
    exchange, sam2_dir, weights = sys.argv[1], sys.argv[2], sys.argv[3]
    sys.path.insert(0, sam2_dir)

    import cv2
    import numpy as np
    import torch
    from sam2.build_sam import build_sam2_video_predictor

    frames_dir = os.path.join(exchange, "frames")
    out_dir = os.path.join(exchange, "masks")
    os.makedirs(out_dir, exist_ok=True)
    frame_names = sorted(os.listdir(frames_dir))
    first_mask = cv2.imread(os.path.join(exchange, "first_mask.png"),
                            cv2.IMREAD_GRAYSCALE)
    n_objects = int(first_mask.max())
    oh, ow = first_mask.shape[:2]

    device = "cuda:0" if torch.cuda.is_available() else "cpu"
    predictor = build_sam2_video_predictor(determine_model_cfg(weights), weights,
                                           device=device)

    labels = {name: np.zeros((oh, ow), np.uint8) for name in frame_names}
    with torch.inference_mode():
        state = predictor.init_state(frames_dir, offload_video_to_cpu=True)
        # per-instance bbox prompts from the first-frame label map
        # (reference :100-108)
        for instance_id in range(1, n_objects + 1):
            ys, xs = np.where(first_mask == instance_id)
            bbox = [int(xs.min()), int(ys.min()), int(xs.max()), int(ys.max())]
            predictor.add_new_points_or_box(state, box=bbox, frame_idx=0,
                                            obj_id=instance_id - 1)
        # reference :111-121 — first-come id assignment per pixel
        for frame_idx, object_ids, masks in predictor.propagate_in_video(state):
            label = labels[frame_names[frame_idx]]
            for obj_id, mask in zip(object_ids, masks):
                m = mask[0].cpu().numpy() > 0.0
                if m.shape != (oh, ow):
                    m = cv2.resize(m.astype(np.uint8), (ow, oh),
                                   interpolation=cv2.INTER_NEAREST) > 0
                label[m & (label == 0)] = obj_id + 1

    for name, label in labels.items():
        cv2.imwrite(os.path.join(out_dir, os.path.splitext(name)[0] + ".png"),
                    label)
    print(f"sam2_worker: wrote {len(frame_names)} label maps to {out_dir}")


if __name__ == "__main__":
    main()
