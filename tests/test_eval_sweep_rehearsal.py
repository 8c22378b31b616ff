"""End-to-end rehearsal of the M-HIM2K eval sweep (reference
``scripts/eval_image.sh`` -> ``tools/extract_results.py:8-50``), reduced to
1 subset x 2 mask models on a tiny synthetic HIM set, driven through the REAL
public surface: a torch state_dict checkpoint converted in-process, two
``tools/main.py --eval-only`` subprocess runs appending to one test-log, and
``tools/extract_results.py`` emitting the reference's exact CSV layout —
asserted against a checked-in golden (``tests/golden/results_rehearsal.csv``,
metric cells normalized since the checkpoint is random). The day real
HIM2K/M-HIM2K data and released weights arrive, only root_dir and weights
change.
"""

import os
import re
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN = os.path.join(REPO, "tests", "golden", "results_rehearsal.csv")
MASK_MODELS = ["r50_c4_3x", "r50_fpn_3x"]

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
def sweep_root(tmp_path_factory):
    """Synthetic HIM eval split with TWO mask-model guidance dirs, the M-HIM2K
    layout the sweep iterates over (reference ``docs/DATASET.md:68-107``)."""
    root = tmp_path_factory.mktemp("him_sweep")
    rs = np.random.RandomState(0)
    img_dir = root / "images/natural"
    img_dir.mkdir(parents=True)
    for i in range(2):
        h, w = 96, 128
        Image.fromarray(rs.randint(0, 255, (h, w, 3), np.uint8)).save(
            img_dir / f"img{i}.jpg")
        adir = root / "alphas/natural" / f"img{i}"
        adir.mkdir(parents=True)
        for j in range(2):
            a = _blob(h, w, 30 + 50 * j, 48, 25)
            Image.fromarray(a).save(adir / f"{j:02d}.png")
            for mi, model in enumerate(MASK_MODELS):
                mdir = root / f"masks_matched_{model}/natural" / f"img{i}"
                mdir.mkdir(parents=True, exist_ok=True)
                # each "detector" gives slightly different guidance masks
                m = (a > (100 + 40 * mi)).astype(np.uint8) * 255
                Image.fromarray(m).save(mdir / f"{j:02d}.png")
    return str(root)


@pytest.fixture(scope="module")
def torch_ckpt(tmp_path_factory):
    """A random flagship-architecture torch state_dict at rehearsal dims, saved
    as .pth — the artifact shape released checkpoints come in."""
    import torch
    from tests.test_full_model_parity import _install_ref_stubs, _ref_cfg
    _install_ref_stubs()
    from maggie.network.arch import maggie as ref_maggie

    torch.manual_seed(0)
    ref = ref_maggie.MaGGIe(_ref_cfg(
        "res_shortcut_embed_29", dict(ENC_ARGS),
        "res_shortcut_inst_matt_spconv_22", dict(DEC_ARGS)))
    sd = ref.state_dict()
    # Converge the spectral-norm u/v pairs (released checkpoints ship converged
    # vectors; fresh random init leaves sigma underestimated by ~the layer's
    # full spectral gap, and 30+ stacked >1-gain convs overflow f32 activations
    # into NaN — in torch exactly as here).
    with torch.no_grad():
        for k in [k for k in sd if k.endswith("weight_bar")]:
            base = k[: -len("bar")]
            if base + "u" not in sd:
                continue
            w = sd[k].reshape(sd[k].shape[0], -1)
            u = sd[base + "u"]
            for _ in range(50):
                v = torch.nn.functional.normalize(w.t() @ u, dim=0, eps=1e-12)
                u = torch.nn.functional.normalize(w @ v, dim=0, eps=1e-12)
            sd[base + "u"], sd[base + "v"] = u, v
    pth = tmp_path_factory.mktemp("ckpt") / "last_model.pth"
    torch.save(sd, str(pth))
    return str(pth)


def test_eval_sweep_to_results_csv(sweep_root, torch_ckpt, tmp_path):
    out_dir = str(tmp_path / "out")
    name = "eval_full_rehearsal"
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               JAX_COMPILATION_CACHE_DIR="/root/.cache/jax_comp_cache_cpu")
    env.pop("XLA_FLAGS", None)
    overrides = []
    for k, v in {**{f"model.encoder_args.{k}": v for k, v in ENC_ARGS.items()},
                 **{f"model.decoder_args.{k}": v for k, v in DEC_ARGS.items()}}.items():
        overrides += [k, str(v)]
    for model in MASK_MODELS:  # the reduced sweep loop of scripts/eval_image.sh
        cmd = [sys.executable, "tools/main.py",
               "--config", "configs/maggie_image.yaml", "--eval-only",
               "name", name, "output_dir", out_dir,
               "model.weights", torch_ckpt,
               "dataset.test.root_dir", sweep_root,
               "dataset.test.split", "natural",
               "dataset.test.short_size", "64",
               "dataset.test.downscale_mask", "False",
               "dataset.test.mask_dir_name", f"masks_matched_{model}",
               "test.save_results", "False",
               "test.postprocessing", "False",
               "test.log_iter", "10",
               "test.metrics", "['MAD','MSE','SAD','Grad','Conn']",
               ] + overrides
        r = subprocess.run(cmd, env=env, cwd=REPO, capture_output=True,
                           text=True, timeout=1200)
        assert r.returncode == 0, f"eval run ({model}) failed:\n{r.stderr[-3000:]}"

    log = os.path.join(out_dir, name, "test-log_rank0.log")
    assert os.path.exists(log)
    r = subprocess.run([sys.executable, "tools/extract_results.py", log,
                        os.path.join(out_dir, name)],
                       env=env, cwd=REPO, capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    csv_path = os.path.join(out_dir, name, "results.csv")
    rows = open(csv_path).read().strip().split("\n")

    # exact reference layout (/root/reference/tools/extract_results.py:8-10)
    assert rows[0] == "split,masks,MAD,MAD_fg,MAD_unk,MSE,SAD,Grad,Conn"
    assert len(rows) == 1 + len(MASK_MODELS)
    for row, model in zip(rows[1:], MASK_MODELS):
        cells = row.split(",")
        assert cells[0] == "natural"
        assert cells[1] == model
        for cell in cells[2:]:
            assert np.isfinite(float(cell)), row

    # golden: layout with metric cells normalized (random checkpoint -> values
    # are not portable, structure is)
    normalized = [rows[0]] + [
        ",".join(r.split(",")[:2] + ["<float>"] * 7) for r in rows[1:]]
    golden = open(GOLDEN).read().strip().split("\n")
    assert normalized == golden
