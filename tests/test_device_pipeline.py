"""Device preprocessing tail vs the host cv2 chain (data/device_pipeline.py)."""

import numpy as np
import pytest
from PIL import Image

from maggie_tpu.data.device_pipeline import device_preprocess_eval


def _host_chain(frame, masks, short_size, downscale):
    import cv2
    h, w = frame.shape[:2]
    ratio = short_size * 1.0 / min(w, h)
    if ratio != 1:
        size = (int(w * ratio), int(h * ratio))
        frame = cv2.resize(frame, size, interpolation=cv2.INTER_LINEAR)
        masks = [cv2.resize(m, size, interpolation=cv2.INTER_NEAREST)
                 for m in masks]
    else:
        masks = list(masks)
    ph = (64 - frame.shape[0] % 64) % 64
    pw = (64 - frame.shape[1] % 64) % 64
    pad = lambda x: cv2.copyMakeBorder(x, 0, ph, 0, pw, cv2.BORDER_CONSTANT, value=0)
    frame = pad(frame)
    masks = [pad(m) for m in masks]
    img = ((frame / 255.0 - np.array([0.485, 0.456, 0.406]))
           / np.array([0.229, 0.224, 0.225])).astype(np.float32)
    if downscale:
        h8, w8 = frame.shape[0] // 8, frame.shape[1] // 8
        masks = [cv2.resize(m, (w8, h8), interpolation=cv2.INTER_NEAREST)
                 for m in masks]
    return img, np.stack(masks).astype(np.float32) / 255.0, (ph, pw, ratio)


@pytest.mark.parametrize("h0,w0,short", [(240, 320, 160), (200, 150, 128),
                                         (128, 128, 128)])
def test_device_tail_matches_host_chain(h0, w0, short):
    rs = np.random.RandomState(0)
    frame = rs.randint(0, 256, (h0, w0, 3), np.uint8)
    masks = (rs.rand(2, h0, w0) > 0.6).astype(np.uint8) * 255

    img_h, mask_h, (ph, pw, ratio) = _host_chain(frame, list(masks), short, True)
    img_d, mask_d, info = device_preprocess_eval(frame, masks, short, 64, True)
    img_d, mask_d = np.asarray(img_d)[0], np.asarray(mask_d)[0]

    assert img_d.shape == img_h.shape and mask_d.shape == mask_h.shape
    # masks: nearest index maps are cv2-exact
    np.testing.assert_array_equal(mask_d, mask_h)
    # frames: cv2's uint8 bilinear is 5-bit fixed-point; device f32 is within
    # ~1 quantization step (scaled by 1/std)
    tol = (1.0 / 255.0) / 0.224 * 1.5
    assert np.abs(img_d - img_h).max() < tol, np.abs(img_d - img_h).max()
    assert info[0]["ratio"] == ratio and tuple(info[1]["pad_size"]) == (ph, pw)


def test_device_tail_bit_exact_at_ratio_1():
    """At ratio == 1 (no resize) the normalize goes through the host-f64 LUT:
    the device image must be BIT-IDENTICAL to the host transform chain,
    including the x64 pad region (host pads uint8 zeros before Normalize)."""
    from maggie_tpu.data import transforms as T

    rs = np.random.RandomState(7)
    h0, w0 = 96, 200                      # pads to 128x256: exercises the pad
    frame = rs.randint(0, 256, (h0, w0, 3), np.uint8)
    masks = (rs.rand(2, h0, w0) > 0.6).astype(np.uint8) * 255

    import cv2
    ph, pw = (64 - h0 % 64) % 64, (64 - w0 % 64) % 64
    padded = cv2.copyMakeBorder(frame, 0, ph, 0, pw, cv2.BORDER_CONSTANT, value=0)
    host = T.Normalize()({"frames": np.stack([padded]).astype(np.float32)})["frames"][0]

    img_d, _, info = device_preprocess_eval(frame, masks, min(h0, w0), 64, True)
    np.testing.assert_array_equal(np.asarray(img_d)[0], host)
    assert info[0]["ratio"] == 1.0


def test_him_dataset_device_mode(tmp_path):
    """HIMDataset(device_preprocess=True) must emit the same sample structure
    as the host path, with image/mask numerically close and identical
    alpha/trimap (metric side never leaves the host)."""
    import os
    # EVAL layout: root/images/<split>/*.jpg + root/<dir>/<split>/<name>/*.png
    root = tmp_path
    rs = np.random.RandomState(0)
    (root / "images" / "s").mkdir(parents=True)
    name = "im0"
    Image.fromarray(rs.randint(0, 256, (120, 160, 3), np.uint8)).save(
        root / "images" / "s" / f"{name}.jpg")
    for d in ("alphas", "masks"):
        (root / d / "s" / name).mkdir(parents=True)
    for j in range(2):
        a = np.zeros((120, 160), np.uint8)
        a[30 + 10 * j:90, 40 * j + 20:40 * j + 70] = 255
        Image.fromarray(a).save(root / "alphas" / "s" / name / f"{j:02d}.png")
        Image.fromarray(a).save(root / "masks" / "s" / name / f"{j:02d}.png")

    from maggie_tpu.data.him import HIMDataset
    kw = dict(root_dir=str(root), split="s", short_size=64, is_train=False,
              alpha_dir_name="alphas", mask_dir_name="masks", downscale_mask=True)
    host = HIMDataset(**kw)[0]
    dev = HIMDataset(device_preprocess=True, **kw)[0]

    assert set(host) == set(dev)
    np.testing.assert_array_equal(np.asarray(dev["alpha"]), host["alpha"])
    np.testing.assert_array_equal(np.asarray(dev["trimap"]), host["trimap"])
    np.testing.assert_array_equal(np.asarray(dev["mask"]), host["mask"])
    assert np.abs(np.asarray(dev["image"]) - host["image"]).max() < 0.03
    assert [d["name"] for d in dev["transform_info"]] == \
           [d["name"] for d in host["transform_info"]]

    # loader collation keeps device arrays stacked on device
    from maggie_tpu.data.loader import DataLoader
    batch = next(iter(DataLoader(HIMDataset(device_preprocess=True, **kw),
                                 batch_size=1)))
    assert batch["image"].shape[0] == 1 and batch["mask"].shape[:2] == (1, 1)


def test_vim_dataset_device_mode(tmp_path):
    """VIM eval clip via the device tail: engine-consumed keys match the host
    chain (image within the cv2 5-bit fixed-point tolerance; mask bit-exact;
    alpha/trimap on the exact host path so metric parity is untouched)."""
    from PIL import Image

    from maggie_tpu.data.vim import VIMDataset

    rs = np.random.RandomState(3)
    split = tmp_path / "medium"
    h, w = 88, 120
    for t in range(4):
        (split / "fgr" / "vid0").mkdir(parents=True, exist_ok=True)
        Image.fromarray(rs.randint(0, 255, (h, w, 3), np.uint8)).save(
            split / "fgr" / "vid0" / f"{t:04d}.jpg")
        for j in range(2):
            yy, xx = np.mgrid[0:h, 0:w]
            d = np.sqrt((yy - 44) ** 2 + (xx - (30 + 50 * j + 2 * t)) ** 2)
            a = (np.clip((25 - d) / 7.5, 0, 1) * 255).astype(np.uint8)
            for dname in ("pha", "xmem"):
                dd = split / dname / "vid0" / f"{t:04d}"
                dd.mkdir(parents=True, exist_ok=True)
                arr = a if dname == "pha" else ((a > 127) * 255).astype(np.uint8)
                Image.fromarray(arr).save(dd / f"{j:02d}.png")

    kw = dict(root_dir=str(tmp_path), split="medium", is_train=False, short_size=64,
              alpha_dir_name="pha", mask_dir_name="xmem", clip_length=3, clip_overlap=2)
    host = VIMDataset(**kw)
    dev = VIMDataset(device_preprocess=True, **kw)
    assert len(host) == len(dev)
    for i in range(len(host)):
        a, b = host[i], dev[i]
        # cv2's uint8 bilinear is 5-bit fixed point; in ImageNet-normalized
        # units (~/0.225) that allows ~0.03 (same bound as the HIM test above)
        assert np.abs(np.asarray(b["image"]) - a["image"]).max() < 0.03
        np.testing.assert_array_equal(np.asarray(b["mask"]), a["mask"])
        np.testing.assert_array_equal(b["alpha"], a["alpha"])
        np.testing.assert_array_equal(b["trimap"], a["trimap"])
        for k in ("skip", "is_first", "is_last", "image_names"):
            assert b[k] == a[k], k
        assert [t["name"] for t in b["transform_info"]] == \
               [t["name"] for t in a["transform_info"]]
