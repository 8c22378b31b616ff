"""Data-side ground-truth generation and affine helpers
(reference ``maggie/dataloader/utils.py``), numpy-only."""

from __future__ import annotations

import cv2
import numpy as np


def gen_transition_gt(alphas: np.ndarray, masks: np.ndarray | None = None,
                      k_size: int = 25, iterations: int = 1) -> np.ndarray:
    """Transition band = (dilate - erode) > 0, optionally OR'd with mask-alpha
    disagreement (reference ``utils.py:15-35``). alphas: (N, 1, H, W) float.

    NOTE: the reference's disagreement clause compares ``alphas > 127`` /
    ``masks == 255`` on [0,1]-scaled inputs at its call sites (``him.py:190``), so it
    never fires there; replicated as-is for parity.
    """
    kernel = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (k_size, k_size))
    out = []
    for x in alphas:
        m = x[0].astype(np.float32)
        if not m.any():  # padded empty instance slot: band is identically zero
            out.append(np.zeros_like(m))
            continue
        dilated = cv2.dilate(m, kernel, iterations=iterations)
        eroded = cv2.erode(m, kernel, iterations=iterations)
        out.append(((dilated - eroded) > 0).astype(np.float32))
    trans = np.stack(out)[:, None]  # (N, 1, H, W)

    if masks is not None:
        # short-circuit before materializing the 8x upsample (the hot-path cost):
        # diff is all-False iff neither comparison fires anywhere, which is always
        # the case at the [0,1]-scaled call sites (see NOTE above) — checking the
        # small mask plus one scan of alphas replaces a ~260 ms/sample repeat
        if (masks == 255).any() or (alphas > 127).any():
            if masks.shape[-1] != alphas.shape[-1]:
                masks = masks.repeat(8, axis=-1).repeat(8, axis=-2)
            diff = (alphas > 127) != (masks == 255)
            trans[diff > 0] = 1.0
    return trans


def gen_diff_mask(alphas: np.ndarray, k_size: int = 25, iterations: int = 1) -> np.ndarray:
    kernel = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (k_size, k_size))
    out = [cv2.dilate(x[0].astype(np.float32), kernel, iterations=iterations) for x in alphas]
    return np.stack(out)[:, None]


def gen_transition_temporal_gt(alphas: np.ndarray, masks: np.ndarray | None = None,
                               k_size: int = 25, iterations: int = 1) -> np.ndarray:
    """Video transition GT: spatial band gated by inter-frame change
    (reference ``utils.py:37-59``). alphas: (T, 1, H, W)."""
    kernel = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (k_size, k_size))
    temporal = (alphas[1:] - alphas[:-1]) > (1.0 / 255.0)
    out = []
    for i, x in enumerate(alphas):
        m = x[0].astype(np.float32)
        dilated = cv2.dilate(m, kernel, iterations=iterations)
        eroded = cv2.erode(m, kernel, iterations=iterations)
        tm = ((dilated - eroded) > 0).astype(np.float32)
        if i > 0:
            tm[~temporal[i - 1, 0]] = 0.0
        out.append(tm)
    trans = np.stack(out)[:, None]
    if masks is not None:
        # same no-op short-circuit as gen_transition_gt (clause can't fire on
        # [0,1]-scaled inputs; skip the 8x repeat unless it provably could)
        if (masks == 255).any() or (alphas > 127).any():
            up = masks.repeat(8, axis=-1).repeat(8, axis=-2)
            diff = (alphas > 127) != (up == 255)
            trans[diff > 0] = 1.0
    return trans


# ---------------- affine augmentation (reference utils.py:61-221) ----------------

def _transform_matrix_offset_center(matrix, x, y):
    o_x = float(x) / 2 + 0.5
    o_y = float(y) / 2 + 0.5
    offset = np.array([[1, 0, o_x], [0, 1, o_y], [0, 0, 1]])
    reset = np.array([[1, 0, -o_x], [0, 1, -o_y], [0, 0, 1]])
    return offset @ matrix @ reset


def _apply_transforms_cv(xs, M):
    dsize = (np.int32(xs[0].shape[1]), np.int32(xs[0].shape[0]))
    aff = M[:2, :2]
    off = M[:2, 2]
    cvM = np.zeros_like(M[:2, :])
    cvM[:2, :2] = np.flipud(np.fliplr(aff))
    cvM[:2, 2] = np.flip(off, axis=0)
    ys = []
    for x in xs:
        interp = cv2.INTER_LINEAR if x.ndim == 3 else cv2.INTER_NEAREST
        ys.append(cv2.warpAffine(x, cvM, dsize, flags=interp))
    return ys


def _channel_shift(xs, intensity):
    ys = []
    for x in xs:
        if x.ndim == 3:
            lo, hi = np.min(x), np.max(x)
            ys.append(np.clip(x + intensity, lo, hi))
        else:
            ys.append(x)
    return ys


def random_transform(xs, rnd, rt=False, hs=False, ws=False, sh=False,
                     zm=(1, 1), sc=(1, 1), cs=False, hf=False):
    """Random affine over a list of HxWxC images / HxW masks (reference ``:121-221``)."""
    h, w = xs[0].shape[0], xs[0].shape[1]
    theta = np.pi / 180 * rnd.uniform(-rt, rt) if rt else 0
    tx = rnd.uniform(-hs, hs) * h if hs else 0
    ty = rnd.uniform(-ws, ws) * w if ws else 0
    shear = np.pi / 180 * rnd.uniform(-sh, sh) if sh else 0
    if zm[0] == 1 and zm[1] == 1:
        zx = zy = 1
    else:
        zx, zy = rnd.uniform(zm[0], zm[1]), rnd.uniform(zm[0], zm[1])
    if not (sc[0] == 1 and sc[1] == 1):
        s = rnd.uniform(sc[0], sc[1])
        zx, zy = zx * s, zy * s

    M = None
    if theta != 0:
        M = np.array([[np.cos(theta), -np.sin(theta), 0],
                      [np.sin(theta), np.cos(theta), 0], [0, 0, 1]])
    if tx != 0 or ty != 0:
        shift = np.array([[1, 0, tx], [0, 1, ty], [0, 0, 1]])
        M = shift if M is None else M @ shift
    if shear != 0:
        if rnd.random() < 0.5:
            sm = np.array([[1, -np.sin(shear), 0], [0, np.cos(shear), 0], [0, 0, 1]])
        else:
            sm = np.array([[np.cos(shear), 0, 0], [np.sin(shear), 1, 0], [0, 0, 1]])
        M = sm if M is None else M @ sm
    if zx != 1 or zy != 1:
        zmat = np.array([[zx, 0, 0], [0, zy, 0], [0, 0, 1]])
        M = zmat if M is None else M @ zmat
    if M is not None:
        M = _transform_matrix_offset_center(M, h, w)
        xs = _apply_transforms_cv(xs, M)
    if cs:
        xs = _channel_shift(xs, rnd.uniform(-cs, cs))
    if hf and rnd.rand() < 0.5:
        xs = [np.ascontiguousarray(x[:, ::-1]) for x in xs]
    return xs
