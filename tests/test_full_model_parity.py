"""Full-model conversion parity vs the torch reference (random init).

Instantiates the ACTUAL reference models from /root/reference (torch CPU), random
init, converts the state_dict with tools/convert_torch_ckpt.convert, and diffs
full-model outputs on a fixed input — catching tree-wiring/layout bugs the
per-layer tests (tests/test_convert.py) cannot. Reference load path:
``maggie/network/__init__.py:7-13``; archs ``network/arch/maggie.py:63-159``.

The spconv decoder itself cannot run here (spconv-cu120 needs CUDA), so the two
spconv-free configs are exercised end-to-end:
- MGM baseline: res_shortcut_29 encoder + res_shortcut_22 decoder (configs/mgm.yaml)
- MaGGIe-dense: res_shortcut_embed_29 + res_shortcut_inst_matt_22 — this verifies
  the FULL flagship stack except the sparse ladder (encoder with mask-ID embedding,
  ASPP, InstanceMatteDecoder attention, PRM fuse, compute_unknown).

Unimportable reference deps (fvcore/yacs/spconv are not on this box) are stubbed
module-for-module; the stubs affect only import-time plumbing, not math.

SpectralNorm note: the reference mutates u/v by one power iteration and THEN
computes sigma on every forward, eval included (``spectral_norm.py:22-35,73-80``).
A state_dict captured after a forward therefore holds exactly the u/v that forward
used — so the jax side reproduces it with update_sn=False (sigma straight from the
stored u/v), which is also this framework's deterministic-eval convention.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")


# ---------------------------------------------------------------- ref stubs
def _install_ref_stubs():
    if "yacs" in sys.modules:
        return
    import torch.nn as tnn

    class CfgNode(dict):
        def __init__(self, init_dict=None, **kw):
            super().__init__()
            for k, v in dict(init_dict or {}, **kw).items():
                if isinstance(v, dict) and not isinstance(v, CfgNode):
                    v = CfgNode(v)
                self[k] = v

        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError as e:
                raise AttributeError(k) from e

        def __setattr__(self, k, v):
            self[k] = v

    yacs = types.ModuleType("yacs")
    yacs_config = types.ModuleType("yacs.config")
    yacs_config.CfgNode = CfgNode
    yacs.config = yacs_config

    wi = types.ModuleType("fvcore.nn.weight_init")

    def c2_xavier_fill(m):
        tnn.init.kaiming_uniform_(m.weight, a=1)
        if getattr(m, "bias", None) is not None:
            tnn.init.constant_(m.bias, 0)

    wi.c2_xavier_fill = c2_xavier_fill
    fv = types.ModuleType("fvcore")
    fvnn = types.ModuleType("fvcore.nn")
    fv.nn = fvnn
    fvnn.weight_init = wi

    # kornia: imported by reference utils.py:5 but only used in a commented-out
    # dilation path (utils.py:36-40) — a bare callable stub suffices
    kornia = types.ModuleType("kornia")
    kornia_m = types.ModuleType("kornia.morphology")
    kornia_m.dilation = lambda *a, **kw: (_ for _ in ()).throw(
        RuntimeError("kornia stub: dead code path"))
    kornia.morphology = kornia_m

    # spconv: a RUNNABLE pure-torch rulebook emulation (tests/spconv_emulation.py)
    # so the reference's spconv decoder executes unmodified as an oracle
    import spconv_emulation as emu
    spconv = types.ModuleType("spconv")
    spconv_pt = types.ModuleType("spconv.pytorch")
    for name in ("SparseSequential", "SubMConv2d", "SparseConv2d",
                 "SparseInverseConv2d", "SparseConvTensor", "SparseModule"):
        setattr(spconv_pt, name, getattr(emu, name))
    spconv.pytorch = spconv_pt

    sys.modules.update({
        "yacs": yacs, "yacs.config": yacs_config,
        "fvcore": fv, "fvcore.nn": fvnn, "fvcore.nn.weight_init": wi,
        "spconv": spconv, "spconv.pytorch": spconv_pt,
        "kornia": kornia, "kornia.morphology": kornia_m,
    })
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")


def _ref_cfg(encoder, encoder_args, decoder, decoder_args):
    from yacs.config import CfgNode
    return CfgNode({
        "encoder": encoder, "encoder_args": encoder_args,
        "decoder": decoder, "decoder_args": decoder_args,
        "aspp": {"in_channels": 512, "out_channels": 512},
        "loss_alpha_w": 1.0, "loss_alpha_type": "l1",
        "loss_alpha_grad_w": 0.05, "loss_alpha_lap_w": 0.05,
        "loss_atten_w": 0.0, "loss_reweight_os8": False, "loss_dtSSD_w": 0.0,
    })


def _jax_cfg(encoder, encoder_args, decoder, decoder_args):
    from maggie_tpu.config import load_config
    cfg = load_config()
    cfg.model.arch = "MaGGIe"
    cfg.model.encoder = encoder
    cfg.model.encoder_args.update(encoder_args)
    cfg.model.decoder = decoder
    cfg.model.decoder_args.update(decoder_args)
    return cfg


def _batch_np(h=128, w=128, n_i=2, seed=0):
    rs = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    alphas = []
    for j in range(n_i):
        cx, cy, r = (j + 1) * w // (n_i + 1), h // 2, h // 4
        d = np.sqrt((yy - cy) ** 2 + (xx - cx) ** 2)
        alphas.append(np.clip((r - d) / (r * 0.2), 0, 1))
    alpha = np.stack(alphas).astype(np.float32)
    mask = (alpha > 0.5).astype(np.float32)[:, ::8, ::8]
    image = rs.rand(h, w, 3).astype(np.float32)
    return image, mask


def _run_parity(encoder, encoder_args, decoder, decoder_args, out_keys,
                n_i=2, atol=2e-4, mad_tol=1e-5):
    _install_ref_stubs()
    from maggie.network.arch import maggie as ref_maggie  # noqa: E402 (stubs first)
    from tools.convert_torch_ckpt import Converter

    # reference bug workaround: resnet_inst_matt.py:122 calls
    # compute_unknown(..., train_mode=...) but the utils signature is is_train=
    # (utils/utils.py:28) — the ablation decoder is bit-rotted upstream
    import maggie.network.decoder.resnet_inst_matt as _rim
    if not getattr(_rim, "_train_mode_patched", False):
        _orig_cu = _rim.compute_unknown

        def _cu(*a, train_mode=False, **kw):
            return _orig_cu(*a, is_train=train_mode, **kw)

        _rim.compute_unknown = _cu
        _rim._train_mode_patched = True
    from maggie_tpu.models import build_model
    import jax
    import jax.numpy as jnp
    from flax.traverse_util import flatten_dict, unflatten_dict

    torch.manual_seed(0)
    ref = ref_maggie.MaGGIe(_ref_cfg(encoder, encoder_args, decoder, decoder_args))
    ref.eval()

    image, mask = _batch_np(n_i=n_i)
    t_batch = {
        "image": torch.from_numpy(image).permute(2, 0, 1)[None, None],
        "mask": torch.from_numpy(mask)[None, None],
    }
    with torch.no_grad():
        t_out = ref(t_batch)

    sd = {k: np.asarray(v.numpy()) for k, v in ref.state_dict().items()}
    conv = Converter()
    conv.maggie(sd, decoder=decoder)
    assert not sd, f"unconverted torch keys: {sorted(sd)[:8]}"
    flat = {}
    for coll in ("params", "batch_stats", "spectral"):
        for k, v in getattr(conv, coll).items():
            flat[f"{coll}/{k}"] = v

    cfg = _jax_cfg(encoder, encoder_args, decoder, decoder_args)
    model = build_model(cfg.model)
    j_batch = {
        "image": jnp.asarray(image)[None, None],
        "mask": jnp.asarray(mask)[None, None],
    }
    # variable STRUCTURE only (no compute), then fill from the converted arrays;
    # every leaf must come from the conversion — a missing key is a wiring bug
    tmpl = jax.eval_shape(
        lambda: model.init({"params": jax.random.PRNGKey(0)}, j_batch, train=False))
    variables = {}
    for coll, tree in tmpl.items():
        tflat = flatten_dict(tree)
        got = {}
        for k, leaf in tflat.items():
            path = f"{coll}/" + "/".join(k)
            assert path in flat, f"converted checkpoint missing {path}"
            v = flat[path]
            assert tuple(v.shape) == tuple(leaf.shape), (path, v.shape, leaf.shape)
            got[k] = jnp.asarray(v)
        variables[coll] = unflatten_dict(got)
    extra = [p for p in flat if not any(p.startswith(c + "/") for c in tmpl)]
    assert not extra, f"converted arrays with no destination: {extra[:5]}"

    # SN protocol: torch updates u/v THEN computes sigma, so the state_dict's u/v
    # are exactly the pair the captured forward used — reproduce it with
    # update_sn=False (sigma straight from stored u/v, no extra iteration)
    j_out = model.apply(variables, j_batch, train=False, update_sn=False)

    for key in out_keys:
        t = t_out[key].numpy()
        j = np.asarray(j_out[key], np.float32)
        assert t.shape == j.shape, (key, t.shape, j.shape)
        mad = np.abs(t - j).mean()
        assert mad < mad_tol, f"{key}: MAD {mad}"
        if key != "refined_masks":  # fuse thresholds can flip knife-edge pixels
            np.testing.assert_allclose(t, j, atol=atol, rtol=0,
                                       err_msg=f"output {key}")


@pytest.mark.slow
def test_mgm_full_model_parity():
    """MGM baseline (configs/mgm.yaml model tree): encoder+ASPP+dense decoder."""
    _run_parity(
        "res_shortcut_29", {"num_mask": 1, "num_embed": 3},
        "res_shortcut_22", {"max_inst": 1},
        out_keys=("alpha_os1", "alpha_os4", "alpha_os8", "refined_masks"),
        n_i=1,
    )


def test_spconv_emulation_matches_dense_torch():
    """Anchor the rulebook emulation against torch's own dense ops: with a fully
    active input set, SubMConv2d == conv2d, SparseConv2d == strided conv2d, and
    SparseInverseConv2d == conv_transpose2d(stride 2, padding 1,
    output_padding 1) with the unflipped kernel. This pins the emulation (and
    hence the flagship oracle below) to torch semantics independent of any code
    in maggie_tpu."""
    import torch.nn.functional as F
    from spconv_emulation import (SparseConv2d, SparseConvTensor,
                                  SparseInverseConv2d, SubMConv2d)

    torch.manual_seed(1)
    b, c, h, w = 2, 5, 16, 16
    x = torch.randn(b, c, h, w)
    yy, xx = torch.meshgrid(torch.arange(h), torch.arange(w), indexing="ij")
    idx = torch.stack([
        torch.repeat_interleave(torch.arange(b), h * w),
        yy.reshape(-1).repeat(b), xx.reshape(-1).repeat(b)], 1).to(torch.int32)
    feats = x.permute(0, 2, 3, 1).reshape(-1, c)
    sp = SparseConvTensor(feats, idx, (h, w), b)

    subm = SubMConv2d(c, 7, 3, padding=1, bias=True)
    got = subm(sp).dense()
    want = F.conv2d(x, subm.weight.permute(0, 3, 1, 2), subm.bias, padding=1)
    torch.testing.assert_close(got, want, atol=1e-5, rtol=1e-5)

    down = SparseConv2d(c, 6, 3, stride=2, padding=1, bias=False,
                        indice_key="k")
    sp2 = down(sp)
    want2 = F.conv2d(x, down.weight.permute(0, 3, 1, 2), None, stride=2,
                     padding=1)
    torch.testing.assert_close(sp2.dense(), want2, atol=1e-5, rtol=1e-5)

    inv = SparseInverseConv2d(6, 4, 3, bias=False, indice_key="k")
    got3 = inv(sp2).dense()
    # conv_transpose2d weight layout (in, out, kh, kw), same unflipped kernel
    want3 = F.conv_transpose2d(want2, inv.weight.permute(3, 0, 1, 2), None,
                               stride=2, padding=1, output_padding=1)
    torch.testing.assert_close(got3, want3, atol=1e-5, rtol=1e-5)


@pytest.mark.slow
def test_maggie_spconv_full_model_parity():
    """THE flagship config (configs/maggie_image.yaml model tree):
    res_shortcut_embed_29 + res_shortcut_inst_matt_spconv_22. The reference's
    own spconv decoder runs against the pure-torch rulebook emulation
    (tests/spconv_emulation.py) — closing the 'inverse-conv orientation
    unverifiable' caveat: the JAX block/oracle ladder must match the
    reference code executing real index-book semantics end-to-end."""
    _run_parity(
        "res_shortcut_embed_29", {"num_mask": 10, "num_embed": 3},
        "res_shortcut_inst_matt_spconv_22",
        {"atten_block": 2, "atten_dim": 128, "atten_head": 1, "atten_stride": 1,
         "final_channel": 64, "max_inst": 10, "use_id_pe": True,
         "warmup_mask_atten_iter": 0, "warmup_detail_iter": 0,
         "detail_mask_dropout": 0.1},
        out_keys=("alpha_os1", "alpha_os4", "alpha_os8", "refined_masks",
                  "detail_mask"),
    )


@pytest.mark.slow
def test_maggie_dense_full_model_parity():
    """MaGGIe with the dense InstMatt decoder: the full flagship stack minus the
    sparse ladder (mask-ID embedding, IMD attention, PRM fuse, compute_unknown)."""
    _run_parity(
        "res_shortcut_embed_29", {"num_mask": 10, "num_embed": 3},
        "res_shortcut_inst_matt_22",
        # final_channel MUST be 128 for this decoder: the reference feeds the IMD's
        # out_feat straight into layer3 whose inplanes is 128
        # (resnet_inst_matt.py:41,174) — 64 would crash the torch model
        {"atten_block": 2, "atten_dim": 128, "atten_head": 1, "atten_stride": 1,
         "final_channel": 128, "max_inst": 10, "use_id_pe": True,
         "warmup_mask_atten_iter": 0, "warmup_detail_iter": 0},
        out_keys=("alpha_os1", "alpha_os4", "alpha_os8", "refined_masks",
                  "detail_mask"),
    )
