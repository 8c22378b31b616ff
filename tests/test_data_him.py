"""HIM dataset + transforms on a tiny synthetic dataset written to tmp."""

import os

import cv2
import numpy as np
import pytest
from PIL import Image

from maggie_tpu.data.him import HIMDataset
from maggie_tpu.data.loader import DataLoader


def _make_blob_alpha(h, w, cx, cy, r, rs):
    yy, xx = np.mgrid[0:h, 0:w]
    d = np.sqrt((yy - cy) ** 2 + (xx - cx) ** 2)
    alpha = np.clip((r - d) / max(r * 0.3, 1), 0, 1)
    return (alpha * 255).astype(np.uint8)


@pytest.fixture(scope="module")
def him_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("him")
    rs = np.random.RandomState(0)
    # TRAIN layout: root/<split>/images + root/<split>/alphas (docs/DATASET.md:68-87)
    # EVAL layout:  root/images/<split> + root/alphas/<split> + root/masks/<split>
    for split_kind, base in [("train", root), ("test", root)]:
        if split_kind == "train":
            img_dir = root / "tr" / "images"
            alpha_base = root / "tr" / "alphas"
            mask_base = None
        else:
            img_dir = base / "images" / "natural"
            alpha_base = base / "alphas" / "natural"
            mask_base = base / "masks" / "natural"
        img_dir.mkdir(parents=True, exist_ok=True)
        for i in range(3):
            h, w = 96 + 32 * (i % 2), 128
            img = rs.randint(0, 255, (h, w, 3), np.uint8)
            Image.fromarray(img).save(img_dir / f"img{i}.jpg")
            adir = alpha_base / f"img{i}"
            adir.mkdir(parents=True, exist_ok=True)
            n_inst = 2 + (i % 2)
            for j in range(n_inst):
                a = _make_blob_alpha(h, w, 20 + 30 * j, h // 2, 22, rs)
                Image.fromarray(a).save(adir / f"{j:02d}.png")
                if mask_base is not None:
                    mdir = mask_base / f"img{i}"
                    mdir.mkdir(parents=True, exist_ok=True)
                    Image.fromarray(((a > 127) * 255).astype(np.uint8)).save(mdir / f"{j:02d}.png")
    return str(root)


def test_eval_dataset(him_root):
    ds = HIMDataset(root_dir=him_root, split="natural", is_train=False, short_size=64,
                    downscale_mask=False, alpha_dir_name="alphas", mask_dir_name="masks")
    assert len(ds) == 3
    s = ds[0]
    t, n_i, h, w = s["alpha"].shape
    assert t == 1 and n_i == 2
    assert s["image"].shape[0] == 1 and s["image"].shape[3] == 3
    assert s["image"].shape[1] % 64 == 0 and s["image"].shape[2] % 64 == 0
    assert s["mask"].shape == (1, n_i, s["image"].shape[1], s["image"].shape[2])
    assert set(np.unique(s["trimap"])) <= {0.0, 1.0, 2.0}
    # ori-space alphas kept for metrics
    assert s["alpha"].max() <= 1.0
    assert s["skip"] == 0
    assert any(t["name"] == "resize" for t in s["transform_info"])


def test_eval_dataset_no_maskdir_uses_alpha(him_root):
    ds = HIMDataset(root_dir=him_root, split="natural", is_train=False, short_size=64,
                    downscale_mask=False, alpha_dir_name="alphas", mask_dir_name="")
    s = ds[0]
    assert s["mask"].max() <= 1.0 and s["mask"].min() >= 0.0


def test_train_dataset(him_root):
    ds = HIMDataset(root_dir=him_root, split="tr", is_train=True, short_size=64,
                    max_inst=5, crop=(64, 64), alpha_dir_name="alphas", mask_dir_name="",
                    random_seed=7)
    s = ds[0]
    assert s["alpha"].shape == (1, 5, 64, 64)
    assert s["mask"].shape[0:2] == (1, 5)
    assert s["mask"].shape[-1] == 8  # downscaled to w/8
    assert s["transition"].shape == (1, 5, 64, 64)
    assert s["alpha"].max() <= 1.0


def test_loader_batches(him_root):
    ds = HIMDataset(root_dir=him_root, split="tr", is_train=True, short_size=64,
                    max_inst=4, crop=(64, 64), alpha_dir_name="alphas", mask_dir_name="")
    dl = DataLoader(ds, batch_size=2, shuffle=True, drop_last=True, seed=1)
    batches = list(dl)
    assert len(batches) == 1
    b = batches[0]
    assert b["image"].shape == (2, 1, 64, 64, 3)
    assert b["alpha"].shape == (2, 1, 4, 64, 64)


def test_loader_sharding(him_root):
    ds = HIMDataset(root_dir=him_root, split="natural", is_train=False, short_size=64,
                    downscale_mask=False, alpha_dir_name="alphas", mask_dir_name="masks")
    all_names = []
    for shard in range(2):
        dl = DataLoader(ds, batch_size=1, num_shards=2, shard_index=shard)
        for b in dl:
            all_names.extend(b["image_names"][0])
    assert len(all_names) == 3 and len(set(all_names)) == 3


def test_decode_cache_identical_outputs(him_root):
    """cache_images: cached epochs produce byte-identical samples to uncached,
    and serving copies protects the cache from downstream in-place augs."""
    kw = dict(root_dir=him_root, split="tr", is_train=True, short_size=64,
              max_inst=5, crop=(64, 64), alpha_dir_name="alphas", mask_dir_name="")
    ds_plain = HIMDataset(random_seed=11, **kw)
    ds_cache = HIMDataset(random_seed=11, cache_images=1.0, **kw)
    # two passes: pass 2 is served from cache; same seed -> same RNG stream
    for _pass in range(2):
        for i in range(len(ds_plain)):
            a, b = ds_plain[i], ds_cache[i]
            for k in ("image", "mask", "alpha", "transition"):
                np.testing.assert_array_equal(a[k], b[k], err_msg=f"pass{_pass} [{i}] {k}")
    load = ds_cache.transforms.transforms[0]
    assert load._cache and load._bytes > 0
    # mutation safety: corrupting a served array must not corrupt the cache
    served = load._decode(next(iter(load._cache))[0], "RGB")
    served[:] = 0
    again = load._decode(next(iter(load._cache))[0], "RGB")
    assert again.max() > 0
