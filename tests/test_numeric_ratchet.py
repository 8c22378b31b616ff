"""Numeric eval RATCHET (VERDICT r4 item 8): a fixed-seed, fixed-weights eval
through the REAL ``engine.test`` path on a deterministic synthetic HIM set,
asserted against checked-in metric floats at rtol 1e-6.

Purpose: perf work on the eval path (layout changes, fusion, packing
bijections, sparse-ladder rewrites) must not silently drift numerics between
rounds — any change that moves MAD/MSE/SAD/Grad/Conn beyond float-roundoff
fails here, forcing an explicit golden regeneration with a written
justification. The structural sweep rehearsal (test_eval_sweep_rehearsal.py)
normalizes metric cells to ``<float>``; this test pins the values themselves.

The eval condition is the production one at reduced scale: fp32 (so the
golden is not hostage to bf16 rounding-mode details), sparse_mode="block"
cap 0.5 (the headline bench path), metrics incl. the region MADs whose quirks
are parity-pinned against ``/root/reference/maggie/utils/metric.py:68-98``.

Regenerate intentionally with ``RATCHET_REGEN=1 python -m pytest
tests/test_numeric_ratchet.py`` and commit the diff with the reason.
"""

import json
import os

import numpy as np
import pytest
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN = os.path.join(REPO, "tests", "golden", "metrics_ratchet.json")

ENC_ARGS = {"num_embed": 3, "num_mask": 3}
DEC_ARGS = {"atten_block": 1, "atten_dim": 32, "atten_head": 1,
            "atten_stride": 1, "final_channel": 32, "max_inst": 3,
            "use_id_pe": True, "warmup_mask_atten_iter": 0,
            "warmup_detail_iter": 0, "detail_mask_dropout": 0.1}


def _blob(h, w, cx, cy, r):
    yy, xx = np.mgrid[0:h, 0:w]
    d = np.sqrt((yy - cy) ** 2 + (xx - cx) ** 2)
    return (np.clip((r - d) / max(r * 0.3, 1), 0, 1) * 255).astype(np.uint8)


@pytest.fixture(scope="module")
def ratchet_root(tmp_path_factory):
    """Deterministic synthetic HIM eval split (legacy RandomState => byte-
    stable across numpy versions)."""
    root = tmp_path_factory.mktemp("him_ratchet")
    rs = np.random.RandomState(7)
    img_dir = root / "images/natural"
    img_dir.mkdir(parents=True)
    for i in range(2):
        h, w = 96, 128
        # .jpg: the eval glob is *.jpg (reference parity, data/him.py:85).
        # JPEG decode is deterministic for a fixed libjpeg build, which is the
        # ratchet's scope (same host across rounds).
        Image.fromarray(rs.randint(0, 255, (h, w, 3), np.uint8)).save(
            img_dir / f"img{i}.jpg", quality=95)
        adir = root / "alphas/natural" / f"img{i}"
        mdir = root / "masks/natural" / f"img{i}"
        adir.mkdir(parents=True)
        mdir.mkdir(parents=True)
        for j in range(2):
            a = _blob(h, w, 30 + 50 * j, 48 + 8 * i, 25)
            Image.fromarray(a).save(adir / f"{j:02d}.png")
            Image.fromarray(((a > 120) * 255).astype(np.uint8)).save(
                mdir / f"{j:02d}.png")
    return str(root)


def test_eval_metrics_match_golden(ratchet_root):
    from maggie_tpu.config import load_config
    from maggie_tpu.engine.test import test as run_test
    from maggie_tpu.models import build_model
    from maggie_tpu.utils.checkpoint import fold_spectral_norm
    from __graft_entry__ import _make_batch
    import jax

    cfg = load_config(os.path.join(REPO, "configs", "maggie_image.yaml"))
    cfg.model.precision = "fp32"
    cfg.model.encoder_args.update(ENC_ARGS)
    cfg.model.decoder_args.update(DEC_ARGS)
    cfg.model.decoder_args.update(dict(sparse_mode="block", block_cap_frac=0.5))
    cfg.name = "ratchet"
    cfg.output_dir = "/tmp/ratchet_out"
    cfg.dataset.test.merge_from_other(dict(
        name="HIM", root_dir=ratchet_root, split="natural", short_size=64,
        alpha_dir_name="alphas", mask_dir_name="masks", downscale_mask=False))
    cfg.test.batch_size = 1
    cfg.test.save_results = False
    cfg.test.postprocessing = False
    cfg.test.log_iter = 10
    cfg.test.metrics = ["MAD", "MSE", "SAD", "Grad", "Conn"]

    model = build_model(cfg.model)
    variables = model.init({"params": jax.random.PRNGKey(42)},
                           _make_batch(1, 1, 2, 64, 64), train=False)
    variables = fold_spectral_norm(variables)
    results = {k: float(v) for k, v in run_test(cfg, variables=variables).items()}
    assert set(results) >= {"MAD", "MAD_fg", "MAD_bg", "MAD_unk",
                            "MSE", "SAD", "Grad", "Conn"}
    assert all(np.isfinite(v) for v in results.values()), results
    # a random-init model on blob GT cannot score 0 — 0 means the dataset
    # glob matched nothing and every metric divided by count=0
    assert results["MAD"] > 0 and results["SAD"] > 0, results

    if os.environ.get("RATCHET_REGEN") or not os.path.exists(GOLDEN):
        with open(GOLDEN, "w") as f:
            json.dump(results, f, indent=1, sort_keys=True)
        pytest.skip(f"golden (re)generated at {GOLDEN}; commit it with a reason")

    with open(GOLDEN) as f:
        golden = json.load(f)
    assert set(results) == set(golden), (sorted(results), sorted(golden))
    for k in sorted(golden):
        np.testing.assert_allclose(
            results[k], golden[k], rtol=1e-6, atol=1e-9,
            err_msg=f"eval metric {k} drifted from the committed golden — "
                    f"if intentional, RATCHET_REGEN=1 and commit with a reason")
