"""Video stack end-to-end: VIM dataset, MaGGIe_Temp arch, streaming eval, train step."""

import numpy as np
import pytest
from PIL import Image

from maggie_tpu.config import load_config


def _blob(h, w, cx, cy, r):
    yy, xx = np.mgrid[0:h, 0:w]
    d = np.sqrt((yy - cy) ** 2 + (xx - cx) ** 2)
    return (np.clip((r - d) / max(r * 0.3, 1), 0, 1) * 255).astype(np.uint8)


@pytest.fixture(scope="module")
def vim_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("vim")
    rs = np.random.RandomState(0)
    split = root / "medium"
    # heterogeneous video shapes: exercises eval_video's shape bucketing
    # (each video pads to a canonical bucket; state stays per-video consistent)
    for vid, (h, w) in [("vid0", (96, 128)), ("vid1", (88, 120))]:
        n_frames = 6
        (split / "fgr" / vid).mkdir(parents=True)
        for t in range(n_frames):
            Image.fromarray(rs.randint(0, 255, (h, w, 3), np.uint8)).save(
                split / "fgr" / vid / f"{t:04d}.jpg")
            for j in range(2):
                adir = split / "pha" / vid / f"{t:04d}"
                adir.mkdir(parents=True, exist_ok=True)
                a = _blob(h, w, 30 + 50 * j + 2 * t, 48, 25)
                Image.fromarray(a).save(adir / f"{j:02d}.png")
                mdir = split / "xmem" / vid / f"{t:04d}"
                mdir.mkdir(parents=True, exist_ok=True)
                Image.fromarray(((a > 127) * 255).astype(np.uint8)).save(mdir / f"{j:02d}.png")
    return str(root)


def _video_cfg(root, out_dir):
    cfg = load_config()
    cfg.name = "tinyvid"
    cfg.output_dir = out_dir
    cfg.dataset.test.merge_from_other(dict(
        name="VIM", root_dir=root, split="medium", short_size=64,
        alpha_dir_name="pha", mask_dir_name="xmem", clip_length=3, clip_overlap=2))
    cfg.dataset.train.merge_from_other(dict(
        name="VIM", root_dir=root, split="medium", short_size=64, max_inst=3,
        crop=[64, 64], alpha_dir_name="pha", mask_dir_name="", clip_length=3,
        max_step_size=2))
    cfg.model.arch = "MaGGIe_Temp"
    cfg.model.encoder = "res_shortcut_embed_29"
    cfg.model.encoder_args.update(dict(num_embed=3, num_mask=3))
    cfg.model.decoder = "res_shortcut_inst_matt_spconv_temp_22"
    cfg.model.decoder_args.update(dict(
        atten_block=1, atten_dim=32, atten_head=1, atten_stride=1, final_channel=32,
        max_inst=3, use_id_pe=True, warmup_mask_atten_iter=0, warmup_detail_iter=1,
        detail_mask_dropout=0.1, temp_method="bi_fusion"))
    cfg.model.loss_dtSSD_w = 1.0
    cfg.test.merge_from_other(dict(batch_size=1, metrics=["MAD", "SAD", "dtSSD", "MESSDdt"],
                                   postprocessing=False, save_results=False, log_iter=1))
    cfg.train.merge_from_other(dict(batch_size=1, max_iter=2, log_iter=1, val_iter=100,
                                    val_metrics=["MAD"], val_best_metric="MAD",
                                    seed=3, num_workers=0))
    cfg.train.optimizer.name = "adamw"
    cfg.train.scheduler.name = "cosine"
    cfg.train.scheduler.warmup_iters = 1
    cfg.wandb.use = False
    return cfg


def test_vim_dataset(vim_root):
    from maggie_tpu.data.vim import VIMDataset
    ds = VIMDataset(root_dir=vim_root, split="medium", clip_length=3, clip_overlap=2,
                    is_train=False, short_size=64, alpha_dir_name="pha",
                    mask_dir_name="xmem")
    # 6 frames, clip 3 overlap 2 -> starts 0..3 per video
    s = ds[0]
    assert s["image"].shape[0] == 3
    assert s["alpha"].shape[:2] == (3, 2)
    assert s["is_first"] == 1 and s["is_last"] == 0
    last = ds[3]
    assert last["is_last"] == 1
    assert last["skip"] == 2

    dtr = VIMDataset(root_dir=vim_root, split="medium", clip_length=3, is_train=True,
                     short_size=64, max_inst=3, crop=[64, 64], alpha_dir_name="pha")
    t = dtr[0]
    assert t["alpha"].shape == (3, 3, 64, 64)
    assert t["transition"].shape == (3, 3, 64, 64)
    assert t["mask"].shape[-1] == 64  # video train masks stay full-res


def test_video_eval_engine(vim_root, tmp_path):
    from maggie_tpu.engine.test import test as run_test
    cfg = _video_cfg(vim_root, str(tmp_path / "out"))
    results = run_test(cfg)
    for k in ["MAD", "SAD", "dtSSD", "MESSDdt"]:
        assert k in results and np.isfinite(results[k]), (k, results)


def test_video_eval_engine_carry_memory(vim_root, tmp_path):
    """Flag-gated FIXED ConvGRU memory carry (cfg.test.carry_memory): the hidden
    state crosses clip windows instead of resetting (the reference's tuple-only
    quirk drops it, engine/test.py:252-254). Must run end-to-end and produce
    finite metrics with the carried-state extra compile."""
    from maggie_tpu.engine.test import test as run_test
    cfg = _video_cfg(vim_root, str(tmp_path / "out_cm"))
    cfg.test.carry_memory = True
    results = run_test(cfg)
    for k in ["MAD", "SAD", "dtSSD"]:
        assert k in results and np.isfinite(results[k]), (k, results)


def test_video_train_step(vim_root, tmp_path):
    from maggie_tpu.engine.train import train as run_train
    cfg = _video_cfg(vim_root, str(tmp_path / "out_train"))
    state = run_train(cfg, use_wandb=False)
    assert int(state.step) == 2


def test_video_eval_feature_cache_exact(vim_root, tmp_path):
    """The streaming feature cache (test.cache_features: encoder+ASPP reuse
    across the clip overlap, engine/test.py) must reproduce the monolithic
    forward's metrics exactly — the reuse is of frame-local computation only."""
    from maggie_tpu.engine.test import test as run_test
    cfg = _video_cfg(vim_root, str(tmp_path / "out_nc"))
    cfg.test.cache_features = False
    base = run_test(cfg)
    cfg2 = _video_cfg(vim_root, str(tmp_path / "out_c"))
    cfg2.test.cache_features = True
    cached = run_test(cfg2)
    for k in ["MAD", "SAD", "dtSSD", "MESSDdt"]:
        assert np.isfinite(cached[k])
        np.testing.assert_allclose(cached[k], base[k], rtol=1e-4, atol=1e-6)
