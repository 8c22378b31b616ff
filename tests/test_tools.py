"""Offline tools: image synthesizer and results extraction."""

import os
import subprocess
import sys

import numpy as np
from PIL import Image


def test_synthesize_image_him(tmp_path):
    rs = np.random.RandomState(0)
    img_root = tmp_path / "hhm/images"
    alpha_root = tmp_path / "hhm/alphas"
    bg_root = tmp_path / "bg"
    img_root.mkdir(parents=True)
    alpha_root.mkdir(parents=True)
    bg_root.mkdir(parents=True)
    for i in range(6):
        h, w = 120, 90
        Image.fromarray(rs.randint(0, 255, (h, w, 3), np.uint8)).save(img_root / f"p{i}.jpg")
        a = np.zeros((h, w), np.uint8)
        a[20:100, 20:70] = 255
        Image.fromarray(a).save(alpha_root / f"p{i}.png")
    for i in range(2):
        Image.fromarray(rs.randint(0, 255, (200, 320, 3), np.uint8)).save(bg_root / f"bg{i}.jpg")

    out = tmp_path / "out"
    r = subprocess.run(
        [sys.executable, "tools/synthesize_image_him.py",
         "--image-root", str(img_root), "--bg-root", str(bg_root),
         "--output_dir", str(out), "--max-num-images", "4", "--n-workers", "1",
         "--invalid-names", str(tmp_path / "none.txt")],
        capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr
    images = os.listdir(out / "images")
    assert len(images) >= 1
    sample = images[0].replace(".jpg", "")
    alphas = os.listdir(out / "alphas" / sample)
    assert 1 <= len(alphas) <= 4
    a = np.array(Image.open(out / "alphas" / sample / alphas[0]))
    assert a.max() > 0


def test_extract_results(tmp_path):
    log = tmp_path / "test-log_rank0.log"
    # the real log format: each run echoes its merged config (tools/main.py),
    # then prints the metric block; the train section's own mask_dir_name/split
    # must be ignored (same gating as the reference parser)
    log.write_text(
        "INFO root: Config:\n"
        "dataset:\n"
        "  test:\n"
        "    alpha_dir_name: alphas\n"
        "    mask_dir_name: masks_matched_r50_fpn_3x\n"
        "    split: natural\n"
        "  train:\n"
        "    mask_dir_name: masks\n"
        "    split: train\n"
        "INFO maggie_tpu.engine.test: Metrics:\n"
        "MAD: 27.17\nMSE: 10.0\nSAD: 5.0\nGrad: 9.94\nConn: 3.3\n"
        "MAD_fg: 1.0\nMAD_bg: 2.0\nMAD_unk: 3.0\n")
    out = tmp_path / "csvout"
    r = subprocess.run([sys.executable, "tools/extract_results.py", str(log), str(out)],
                       capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr
    rows = (out / "results.csv").read_text().strip().split("\n")
    assert rows[0].startswith("split,masks,MAD")
    assert "27.17" in rows[1] and "r50_fpn_3x" in rows[1]


def test_gen_mask(tmp_path):
    """Offline guidance-mask generation: layout + area filter (ref
    tools/gen_mask/image_demo_newbaselines.py:108-113, 175-180)."""
    import cv2
    root = tmp_path / "him"
    (root / "images" / "natural").mkdir(parents=True)
    adir = root / "alphas" / "natural" / "img0"
    adir.mkdir(parents=True)
    rs = np.random.RandomState(0)
    cv2.imwrite(str(root / "images" / "natural" / "img0.jpg"),
                (rs.rand(96, 128, 3) * 255).astype(np.uint8))
    yy, xx = np.mgrid[0:96, 0:128]
    for i, cx in enumerate([40, 90]):
        a = np.clip((30 - np.sqrt((yy - 48) ** 2 + (xx - cx) ** 2)) / 6, 0, 1) * 255
        cv2.imwrite(str(adir / ("%02d.png" % i)), a.astype(np.uint8))
    tiny = np.zeros((96, 128), np.uint8)
    tiny[:3, :3] = 255  # <2% area -> must be dropped
    cv2.imwrite(str(adir / "02.png"), tiny)

    r = subprocess.run(
        [sys.executable, "tools/gen_mask/gen_mask.py", "--root", str(root),
         "--name", "sim", "--subsets", "natural", "--variant", "full", "--seed", "0"],
        capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr
    out = root / "masks_sim" / "natural" / "img0"
    files = sorted(os.listdir(out))
    assert files == ["00.png", "01.png"]  # tiny instance filtered
    m = np.array(Image.open(out / "00.png"))
    assert set(np.unique(m)) <= {0, 255} and m.max() == 255


def test_make_synthetic_vim(tmp_path):
    """The VIM synthesizer writes the exact layout VIMDataset consumes, with
    moving occlusion-disjoint instances and temporally-usable eval masks."""
    root = tmp_path / "svim"
    r = subprocess.run(
        [sys.executable, "tools/make_synthetic_vim.py", str(root),
         "2", "1", "10", "96", "160"],
        capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr

    from maggie_tpu.data.vim import VIMDataset
    tr = VIMDataset(str(root), "train", clip_length=8, is_train=True,
                    short_size=96, crop=(96, 96), max_inst=3)
    assert len(tr) >= 2
    s = tr[0]
    assert s["image"].shape[0] == 8 and s["alpha"].max() > 0
    assert s["mask"].shape == s["alpha"].shape

    ev = VIMDataset(str(root), "eval", clip_length=3, clip_overlap=2,
                    is_train=False, short_size=96, mask_dir_name="xmem")
    s0, s1 = ev[0], ev[1]
    assert s0["is_first"] == 1 and s1["skip"] == 2
    assert s0["mask"].max() > 0  # degraded guidance masks exist

    # instances actually move: alpha at t=0 differs from t=9 for some video
    import glob as _glob
    a0 = np.array(Image.open(sorted(_glob.glob(
        str(root / "train/pha/vtr0000/00000/*.png")))[0]), np.float32)
    a9 = np.array(Image.open(sorted(_glob.glob(
        str(root / "train/pha/vtr0000/00009/*.png")))[0]), np.float32)
    assert np.abs(a0 - a9).mean() > 0.5
    # per-frame occlusion disjointness: sum of alphas <= 1 (+eps)
    frames = sorted(_glob.glob(str(root / "train/pha/vtr0000/00005/*.png")))
    acc = sum(np.array(Image.open(p), np.float32) / 255.0 for p in frames)
    assert acc.max() <= 1.0 + 1e-3
