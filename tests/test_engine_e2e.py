"""End-to-end engine tests on a tiny synthetic HIM dataset: eval via engine.test and
a few training iterations via engine.train."""

import os

import numpy as np
import pytest
from PIL import Image

from maggie_tpu.config import load_config


def _blob(h, w, cx, cy, r):
    yy, xx = np.mgrid[0:h, 0:w]
    d = np.sqrt((yy - cy) ** 2 + (xx - cx) ** 2)
    return (np.clip((r - d) / max(r * 0.3, 1), 0, 1) * 255).astype(np.uint8)


@pytest.fixture(scope="module")
def tiny_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("him_e2e")
    rs = np.random.RandomState(0)
    # eval layout: root/images/<split> + root/alphas/<split> + root/masks/<split>
    img_dir = root / "images/natural"
    alpha_base = root / "alphas/natural"
    mask_base = root / "masks/natural"
    img_dir.mkdir(parents=True)
    for i in range(2):
        h, w = 96, 128
        Image.fromarray(rs.randint(0, 255, (h, w, 3), np.uint8)).save(img_dir / f"img{i}.jpg")
        adir = alpha_base / f"img{i}"
        adir.mkdir(parents=True)
        mdir = mask_base / f"img{i}"
        mdir.mkdir(parents=True)
        for j in range(2):
            a = _blob(h, w, 30 + 50 * j, 48, 25)
            Image.fromarray(a).save(adir / f"{j:02d}.png")
            Image.fromarray(((a > 127) * 255).astype(np.uint8)).save(mdir / f"{j:02d}.png")
    # train layout: root/<split>/images + root/<split>/alphas
    timg = root / "tr/images"
    timg.mkdir(parents=True)
    for i in range(4):
        h, w = 96, 128
        Image.fromarray(rs.randint(0, 255, (h, w, 3), np.uint8)).save(timg / f"t{i}.jpg")
        adir = root / "tr/alphas" / f"t{i}"
        adir.mkdir(parents=True)
        for j in range(2):
            Image.fromarray(_blob(h, w, 30 + 50 * j, 48, 25)).save(adir / f"{j:02d}.png")
    return str(root)


def _tiny_cfg(root, out_dir):
    cfg = load_config()
    cfg.name = "tiny"
    cfg.output_dir = out_dir
    cfg.dataset.test.merge_from_other(dict(
        name="HIM", root_dir=root, split="natural", short_size=64,
        alpha_dir_name="alphas", mask_dir_name="masks", downscale_mask=False))
    cfg.dataset.train.merge_from_other(dict(
        name="HIM", root_dir=root, split="tr", short_size=64, max_inst=3,
        crop=[64, 64], alpha_dir_name="alphas", mask_dir_name=""))
    cfg.model.arch = "MaGGIe"
    cfg.model.encoder = "res_shortcut_embed_29"
    cfg.model.encoder_args.update(dict(num_embed=3, num_mask=3))
    cfg.model.decoder = "res_shortcut_inst_matt_spconv_22"
    cfg.model.decoder_args.update(dict(
        atten_block=1, atten_dim=32, atten_head=1, atten_stride=1, final_channel=32,
        max_inst=3, use_id_pe=True, warmup_mask_atten_iter=0, warmup_detail_iter=1,
        detail_mask_dropout=0.1))
    cfg.model.loss_dtSSD_w = 0.0
    cfg.test.merge_from_other(dict(batch_size=1, metrics=["MAD", "MSE", "SAD", "Grad", "Conn"],
                                   postprocessing=False, save_results=False, log_iter=1))
    cfg.train.merge_from_other(dict(batch_size=2, max_iter=3, log_iter=1, val_iter=3,
                                    val_metrics=["MAD", "MSE"], val_best_metric="MAD",
                                    seed=7, num_workers=0))
    cfg.train.optimizer.name = "adamw"
    cfg.train.scheduler.name = "cosine"
    cfg.train.scheduler.warmup_iters = 1
    cfg.wandb.use = False
    return cfg


def test_eval_engine(tiny_root, tmp_path):
    from maggie_tpu.engine.test import test as run_test
    cfg = _tiny_cfg(tiny_root, str(tmp_path / "out"))
    results = run_test(cfg)
    for k in ["MAD", "MSE", "SAD", "Grad", "Conn", "MAD_fg", "MAD_bg", "MAD_unk"]:
        assert k in results and np.isfinite(results[k]), k


def test_train_engine(tiny_root, tmp_path):
    from maggie_tpu.engine.train import train as run_train
    cfg = _tiny_cfg(tiny_root, str(tmp_path / "out_train"))
    state = run_train(cfg, use_wandb=False)
    assert int(state.step) == 3
    assert os.path.exists(os.path.join(cfg.output_dir, "best_model.npz"))
    assert os.path.isdir(os.path.join(cfg.output_dir, "last_state"))
    # resume from the checkpoint
    cfg2 = _tiny_cfg(tiny_root, cfg.output_dir)
    cfg2.train.resume_last = True
    cfg2.train.max_iter = 4
    state2 = run_train(cfg2, use_wandb=False)
    assert int(state2.step) == 4


def test_dummy_arch_smoke(tiny_root, tmp_path):
    """The reference's only mock: arch Dummy returns the input mask as the
    prediction (arch/dummy.py:3-9), smoke-testing data/engine/metrics without a
    model. With mask == binarized alpha the metrics must be near-perfect."""
    from maggie_tpu.engine.test import test as run_test
    cfg = _tiny_cfg(tiny_root, str(tmp_path / "out_dummy"))
    cfg.model.arch = "Dummy"
    results = run_test(cfg)
    assert results["MAD"] < 20000  # binarized-mask-vs-soft-alpha gap only
    assert results["MSE"] < 20000
    assert np.isfinite(results["Grad"])
