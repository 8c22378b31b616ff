"""Demo surface tests: segmenter boundary + app image flow end-to-end (CPU).

VERDICT r2 item 8: the segmenter stage is an interface whose mask-file backend
works today and whose external-model backends raise with recipes.
"""

import os
import sys

import numpy as np
import pytest
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "demo"))


def _blob_image(h=64, w=64):
    rs = np.random.RandomState(0)
    img = Image.fromarray((rs.rand(h, w, 3) * 255).astype(np.uint8))
    m = np.zeros((h, w), np.uint8)
    m[16:48, 8:30] = 255
    m2 = np.zeros((h, w), np.uint8)
    m2[20:60, 36:60] = 255
    return img, [m, m2]


def test_mask_file_segmenter(tmp_path):
    from segmenters import MaskFileSegmenter, label_map_to_instances

    img, masks = _blob_image()
    paths = []
    for i, m in enumerate(masks):
        p = tmp_path / f"m{i}.png"
        Image.fromarray(m).save(p)
        paths.append(str(p))
    vis, label_map = MaskFileSegmenter(paths).segment(img)
    assert set(np.unique(label_map)) == {0, 1, 2}
    inst = label_map_to_instances(label_map)
    assert len(inst) == 2
    np.testing.assert_array_equal(inst[0] > 0, masks[0] > 0)
    assert vis.size == img.size

    # single label-map file round-trips too
    p = tmp_path / "lm.png"
    Image.fromarray(label_map).save(p)
    _, lm2 = MaskFileSegmenter([str(p)]).segment(img)
    np.testing.assert_array_equal(lm2, label_map)


def test_external_backends_raise_with_recipe():
    from segmenters import (MaskRCNNOnnxSegmenter, Sam2Propagator,
                            XMemPropagator)

    for cls, word in ((XMemPropagator, "XMem"), (Sam2Propagator, "sam2"),
                      (MaskRCNNOnnxSegmenter, "onnxruntime")):
        with pytest.raises(RuntimeError, match=word):
            cls()


def test_app_inference_image_with_tiny_model(tmp_path, monkeypatch):
    """Drives app.inference_image end-to-end: mask files -> segmenter ->
    preprocess -> model -> reverse transform -> composites. A tiny flagship
    model stands in for real weights (random init)."""
    import app
    from predict import preprocess

    from maggie_tpu.config import load_config
    from maggie_tpu.models import build_model
    import jax

    img, masks = _blob_image(64, 64)
    paths = []
    for i, m in enumerate(masks):
        p = tmp_path / f"m{i}.png"
        Image.fromarray(m).save(p)
        paths.append(str(p))

    cfg = load_config()
    cfg.model.arch = "MaGGIe"
    cfg.model.encoder = "res_shortcut_embed_29"
    cfg.model.encoder_args.update(dict(num_embed=3, num_mask=10))
    cfg.model.decoder = "res_shortcut_inst_matt_spconv_22"
    cfg.model.decoder_args.update(dict(
        atten_block=1, atten_dim=32, atten_head=1, atten_stride=1,
        final_channel=32, max_inst=10, use_id_pe=True))
    model = build_model(cfg.model)
    batch, _ = preprocess([img], [masks])
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch, train=False)

    class Args:
        config = video_config = None
        weights = video_weights = ""

    monkeypatch.setitem(app._STATE, "image_model", (model, variables))
    vis, mattes = app.inference_image(Args(), img, paths)
    assert len(mattes) == 2
    assert mattes[0].size == img.size
    arr = np.array(mattes[0])
    assert arr.shape == (64, 64, 3) and arr.dtype == np.uint8

    with pytest.raises(RuntimeError, match="No person"):
        empty = tmp_path / "empty.png"
        Image.fromarray(np.zeros((64, 64), np.uint8)).save(empty)
        app.inference_image(Args(), img, [str(empty)])


def test_flow_propagator_tracks_moving_object():
    """FlowPropagator (the offline-working stand-in for XMem/SAM2,
    reference demo/app.py:35-43) must follow a textured square translating
    over a textured background with high IoU on every frame."""
    from segmenters import FlowPropagator

    rs = np.random.RandomState(3)
    h, w, size, step = 96, 128, 36, 4
    bg = (rs.rand(h, w, 3) * 200).astype(np.uint8)
    patch = (rs.rand(size, size, 3) * 255).astype(np.uint8)
    frames, gts = [], []
    for t in range(6):
        x0, y0 = 8 + step * t, 24 + step * t // 2
        img = bg.copy()
        img[y0:y0 + size, x0:x0 + size] = patch
        gt = np.zeros((h, w), np.uint8)
        gt[y0:y0 + size, x0:x0 + size] = 1
        frames.append(Image.fromarray(img))
        gts.append(gt)

    out = FlowPropagator().propagate(frames, gts[0])
    assert len(out) == len(frames)
    ious = []
    for t in range(1, len(frames)):
        inter = np.logical_and(out[t] == 1, gts[t] == 1).sum()
        union = np.logical_or(out[t] == 1, gts[t] == 1).sum()
        ious.append(inter / union)
    # classical flow drifts linearly (boundary smoothing is inherent to
    # Farneback) — assert near-perfect tracking at 1 step and bounded drift
    # over 5, the degraded-guidance regime MaGGIe refines
    assert ious[0] > 0.85, f"frame 1: IoU {ious[0]:.3f}"
    assert min(ious) > 0.6, f"worst IoU {min(ious):.3f}"


def test_video_inference_first_frame_only_masks(tmp_path, monkeypatch):
    """app.inference_video with masks for only frame 0: the flow propagator
    fills the remaining frames and the streaming model consumes them."""
    import app
    from predict import preprocess

    from maggie_tpu.config import load_config
    from maggie_tpu.models import build_model
    import jax

    rs = np.random.RandomState(5)
    h = w = 64
    bg = (rs.rand(h, w, 3) * 200).astype(np.uint8)
    patch = (rs.rand(24, 24, 3) * 255).astype(np.uint8)
    frames_dir = tmp_path / "frames"
    masks_dir = tmp_path / "masks"
    frames_dir.mkdir()
    (masks_dir / "f0").mkdir(parents=True)
    for t in range(4):
        img = bg.copy()
        img[12 + 2 * t:36 + 2 * t, 8 + 3 * t:32 + 3 * t] = patch
        Image.fromarray(img).save(frames_dir / f"f{t}.png")
    m0 = np.zeros((h, w), np.uint8)
    m0[12:36, 8:32] = 255
    Image.fromarray(m0).save(masks_dir / "f0" / "00.png")

    cfg = load_config("configs/maggie_video.yaml")
    cfg.model.decoder_args.update(dict(
        atten_block=1, atten_dim=32, atten_head=1, atten_stride=1,
        final_channel=32, max_inst=10, use_id_pe=True, use_temp_pe=False))
    model = build_model(cfg.model)
    img0 = Image.open(frames_dir / "f0.png")
    batch, _ = preprocess([img0, img0, img0], [[m0], [m0], [m0]])
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch, train=False)

    class Args:
        config = video_config = None
        weights = video_weights = ""

    monkeypatch.setitem(app._STATE, "video_model", (model, variables))
    written, video = app.inference_video(Args(), str(frames_dir), str(masks_dir),
                                         "flow", str(tmp_path / "out"))
    assert len(written) == 4
    for p in written:
        assert os.path.exists(p)
    # the frames are muxed into one video artifact (reference demo/app.py:73-78)
    assert video is not None and os.path.exists(video)
    assert os.path.getsize(video) > 0
    assert os.path.splitext(video)[1] in (".mp4", ".avi", ".gif")

    # videos shorter than the 3-frame clip window (last-frame padding path)
    short_dir = tmp_path / "frames2"
    short_dir.mkdir()
    for t in range(2):
        Image.open(frames_dir / f"f{t}.png").save(short_dir / f"f{t}.png")
    written2, _ = app.inference_video(Args(), str(short_dir), str(masks_dir),
                                      "flow", str(tmp_path / "out2"))
    assert len(written2) == 2
    for p in written2:
        assert os.path.exists(p)
