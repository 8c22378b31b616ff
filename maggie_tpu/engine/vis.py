"""Training visualization (reference ``wandb_log_image``, ``engine/train.py:26-78``).

Writes a panel PNG per vis_iter: input image | guidance mask | GT alpha |
predicted alpha | transition/detail mask, tiled over instances. Logged to wandb
when available, always saved under ``<output_dir>/vis/``.
"""

from __future__ import annotations

import os

import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def _denorm(img: np.ndarray) -> np.ndarray:
    return np.clip((img * IMAGENET_STD + IMAGENET_MEAN) * 255.0, 0, 255).astype(np.uint8)


def save_train_visualization(batch: dict, output: dict, it: int, out_dir: str,
                             max_inst: int = 4) -> str:
    import cv2

    os.makedirs(os.path.join(out_dir, "vis"), exist_ok=True)
    img = _denorm(np.asarray(batch["image"])[0, 0])  # (H, W, 3)
    h, w = img.shape[:2]

    def gray(m):
        m = np.asarray(m).astype(np.float32)
        if m.shape != (h, w):
            m = cv2.resize(m, (w, h), interpolation=cv2.INTER_NEAREST)
        return np.repeat((np.clip(m, 0, 1) * 255).astype(np.uint8)[..., None], 3, -1)

    rows = []
    alphas = np.asarray(batch.get("alpha"))[0, 0] if "alpha" in batch else None
    masks = np.asarray(batch["mask"])[0, 0]
    preds = np.asarray(output["refined_masks"])[0, 0]
    trans = np.asarray(batch.get("transition"))[0, 0] if "transition" in batch else None
    n_i = min(preds.shape[0], max_inst)
    for i in range(n_i):
        panels = [img, gray(masks[i])]
        if alphas is not None:
            panels.append(gray(alphas[i]))
        panels.append(gray(preds[i]))
        if trans is not None:
            panels.append(gray(trans[i]))
        rows.append(np.concatenate(panels, axis=1))
    grid = np.concatenate(rows, axis=0)
    path = os.path.join(out_dir, "vis", f"iter_{it:07d}.png")
    cv2.imwrite(path, grid[..., ::-1])
    return path
