"""Checkpoint-converter validation.

1. Numeric: each conversion rule (SN conv, SN conv-transpose, BN, dense, MHA, embed)
   reproduces the torch layer's output through the flax module.
2. Structural: converted key paths land inside the real flax param tree with
   matching shapes (no silent misses).
"""

import importlib.util
import sys

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo/tools")
from convert_torch_ckpt import Converter, conv_w, convT_w, convert  # noqa: E402

from maggie_tpu.models.layers import SNConv, SNConvTranspose, BatchNorm  # noqa: E402


@pytest.fixture(scope="module")
def ref_sn():
    spec = importlib.util.spec_from_file_location(
        "ref_sn", "/root/reference/maggie/network/module/spectral_norm.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_snconv_conversion_matches_torch(ref_sn):
    torch.manual_seed(0)
    tconv = ref_sn.SpectralNorm(torch.nn.Conv2d(4, 8, 3, padding=1, bias=False))
    x = np.random.RandomState(0).randn(2, 4, 16, 16).astype(np.float32)
    with torch.no_grad():
        # freeze u/v after one power iteration (the forward updates them once)
        ref_out = tconv(torch.from_numpy(x)).numpy()

    params = {
        "params": {"weight_bar": jnp.asarray(conv_w(tconv.module.weight_bar.detach().numpy()))},
        "spectral": {"u": jnp.asarray(tconv.module.weight_u.detach().numpy()),
                     "v": jnp.asarray(tconv.module.weight_v.detach().numpy())},
    }
    m = SNConv(8, (3, 3), (1, 1), (1, 1))
    # torch forward updated u/v BEFORE computing sigma; our stored u/v are post-update,
    # so apply WITHOUT a further update
    y = m.apply(params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))), update_sn=False)
    y = np.transpose(np.asarray(y), (0, 3, 1, 2))
    np.testing.assert_allclose(y, ref_out, atol=1e-5, rtol=1e-4)


def test_snconvtranspose_conversion_matches_torch(ref_sn):
    torch.manual_seed(1)
    tconv = ref_sn.SpectralNorm(torch.nn.ConvTranspose2d(6, 4, 4, stride=2, padding=1, bias=False))
    x = np.random.RandomState(1).randn(2, 6, 8, 8).astype(np.float32)
    with torch.no_grad():
        ref_out = tconv(torch.from_numpy(x)).numpy()

    params = {
        "params": {"weight_bar": jnp.asarray(convT_w(tconv.module.weight_bar.detach().numpy()))},
        "spectral": {"u": jnp.asarray(tconv.module.weight_u.detach().numpy()),
                     "v": jnp.asarray(tconv.module.weight_v.detach().numpy())},
    }
    m = SNConvTranspose(4)
    y = m.apply(params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))), update_sn=False)
    y = np.transpose(np.asarray(y), (0, 3, 1, 2))
    assert y.shape == ref_out.shape
    np.testing.assert_allclose(y, ref_out, atol=1e-5, rtol=1e-4)


def test_bn_conversion_matches_torch_eval():
    torch.manual_seed(2)
    tbn = torch.nn.BatchNorm2d(8)
    tbn.running_mean.normal_()
    tbn.running_var.uniform_(0.5, 2.0)
    tbn.weight.data.normal_()
    tbn.bias.data.normal_()
    tbn.eval()
    x = np.random.RandomState(2).randn(2, 8, 6, 6).astype(np.float32)
    with torch.no_grad():
        ref = tbn(torch.from_numpy(x)).numpy()
    variables = {
        "params": {"bn": {"scale": jnp.asarray(tbn.weight.detach().numpy()),
                          "bias": jnp.asarray(tbn.bias.detach().numpy())}},
        "batch_stats": {"bn": {"mean": jnp.asarray(tbn.running_mean.numpy()),
                               "var": jnp.asarray(tbn.running_var.numpy())}},
    }
    y = BatchNorm().apply(variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1))), train=False)
    np.testing.assert_allclose(np.transpose(np.asarray(y), (0, 3, 1, 2)), ref, atol=1e-5, rtol=1e-4)


def _fake_sd_entry(shape):
    return np.random.RandomState(sum(shape)).randn(*shape).astype(np.float32)


def test_converted_paths_exist_in_model_tree():
    """Convert a synthetic torch state_dict for representative layers and check the
    produced paths exist with matching shapes in the real flax tree."""
    from flax.traverse_util import flatten_dict
    from maggie_tpu.config import load_config
    from maggie_tpu.models import build_model

    cfg = load_config("configs/maggie_image.yaml")
    cfg.model.decoder_args.atten_dim = 32
    cfg.model.decoder_args.final_channel = 32
    model = build_model(cfg.model)
    batch = {"image": jnp.zeros((1, 1, 64, 64, 3)), "mask": jnp.zeros((1, 1, 2, 8, 8))}
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch, train=False)
    tree = {"/".join(k): np.asarray(v).shape
            for k, v in flatten_dict(variables["params"]).items()}
    sn_tree = {"/".join(k): np.asarray(v).shape
               for k, v in flatten_dict(variables["spectral"]).items()}
    bs_tree = {"/".join(k): np.asarray(v).shape
               for k, v in flatten_dict(variables["batch_stats"]).items()}

    sd = {
        # encoder stem + embedding
        "encoder.mask_embed_layer.weight": _fake_sd_entry((11, 3)),
        "encoder.conv1.module.weight_bar": _fake_sd_entry((32, 6, 3, 3)),
        "encoder.conv1.module.weight_u": _fake_sd_entry((32,)),
        "encoder.conv1.module.weight_v": _fake_sd_entry((54,)),
        "encoder.bn1.weight": _fake_sd_entry((32,)),
        "encoder.bn1.bias": _fake_sd_entry((32,)),
        "encoder.bn1.running_mean": _fake_sd_entry((32,)),
        "encoder.bn1.running_var": np.abs(_fake_sd_entry((32,))),
        # one encoder block with downsample
        "encoder.layer2.0.conv1.module.weight_bar": _fake_sd_entry((128, 64, 3, 3)),
        "encoder.layer2.0.conv1.module.weight_u": _fake_sd_entry((128,)),
        "encoder.layer2.0.conv1.module.weight_v": _fake_sd_entry((64 * 9,)),
        "encoder.layer2.0.downsample.1.module.weight_bar": _fake_sd_entry((128, 64, 1, 1)),
        "encoder.layer2.0.downsample.1.module.weight_u": _fake_sd_entry((128,)),
        "encoder.layer2.0.downsample.1.module.weight_v": _fake_sd_entry((64,)),
        # shortcut branch
        "encoder.shortcut.0.0.module.weight_bar": _fake_sd_entry((32, 6, 3, 3)),
        "encoder.shortcut.0.0.module.weight_u": _fake_sd_entry((32,)),
        "encoder.shortcut.0.0.module.weight_v": _fake_sd_entry((54,)),
        # aspp
        "aspp.aspp2.weight": _fake_sd_entry((256, 512, 3, 3)),
        # decoder upsampling block (conv-transpose)
        "decoder.layer1.0.conv1.module.weight_bar": _fake_sd_entry((512, 512, 4, 4)),
        "decoder.layer1.0.conv1.module.weight_u": _fake_sd_entry((512,)),
        "decoder.layer1.0.conv1.module.weight_v": _fake_sd_entry((512 * 16,)),
        # attention
        "decoder.refine_OS8.token_feat_ca_layers.0.multihead_attn.in_proj_weight": _fake_sd_entry((96, 32)),
        "decoder.refine_OS8.token_feat_ca_layers.0.multihead_attn.in_proj_bias": _fake_sd_entry((96,)),
        "decoder.refine_OS8.token_feat_ca_layers.0.multihead_attn.out_proj.weight": _fake_sd_entry((32, 32)),
        "decoder.refine_OS8.token_feat_ca_layers.0.multihead_attn.out_proj.bias": _fake_sd_entry((32,)),
        "decoder.refine_OS8.query_feat.weight": _fake_sd_entry((10, 32)),
        "decoder.refine_OS8.id_embedding.weight": _fake_sd_entry((11, 32)),
        # sparse ladder pieces (spconv layout (O, kh, kw, I))
        "decoder.layer3.0.weight": _fake_sd_entry((64, 3, 3, 32)),
        "decoder.layer3.1.weight": _fake_sd_entry((64,)),
        "decoder.layer3.1.bias": _fake_sd_entry((64,)),
        "decoder.layer3.1.running_mean": _fake_sd_entry((64,)),
        "decoder.layer3.1.running_var": np.abs(_fake_sd_entry((64,))),
        "decoder.refine_OS1.3.weight": _fake_sd_entry((1, 3, 3, 32)),
        "decoder.refine_OS1.3.bias": _fake_sd_entry((1,)),
        # dummy downscale must be dropped
        "decoder.dummy_downscale.0.weight": _fake_sd_entry((32, 3, 3, 3)),
    }
    out = convert(dict(sd))
    for path, v in out.items():
        coll, rest = path.split("/", 1)
        target = {"params": tree, "spectral": sn_tree, "batch_stats": bs_tree}[coll]
        assert rest in target, f"converted path {path} missing from model tree"
        assert tuple(v.shape) == tuple(target[rest]), (path, v.shape, target[rest])
    assert not any("dummy_downscale" in k for k in out)


def test_load_model_weights_from_torch_pth(tmp_path):
    """Reference loads torch checkpoints natively (file or HF snapshot,
    network/__init__.py:7-13); load_model_weights converts .pth in-process."""
    import torch
    from tests.test_full_model_parity import (_install_ref_stubs, _ref_cfg)
    _install_ref_stubs()
    from maggie.network.arch import maggie as ref_maggie

    enc_args = {"num_mask": 2, "num_embed": 0}
    dec_args = {"max_inst": 2}
    torch.manual_seed(0)
    ref = ref_maggie.MaGGIe(_ref_cfg("res_shortcut_29", enc_args,
                                     "res_shortcut_22", dec_args))
    pth = tmp_path / "last_model.pth"
    torch.save(ref.state_dict(), str(pth))

    from maggie_tpu.config import load_config
    from maggie_tpu.models import build_model
    from maggie_tpu.utils.checkpoint import load_model_weights

    cfg = load_config()
    cfg.model.arch = "MaGGIe"
    cfg.model.encoder = "res_shortcut_29"
    cfg.model.encoder_args.update(enc_args)
    cfg.model.decoder = "res_shortcut_22"
    cfg.model.decoder_args.update(dec_args)
    cfg.model.weights = str(pth)
    model = build_model(cfg.model)
    variables = load_model_weights(model, cfg)

    # spot-check one converted leaf: encoder conv1 weight_bar, OIHW -> HWIO
    t = ref.state_dict()["encoder.conv1.module.weight_bar"].numpy()
    j = np.asarray(variables["params"]["encoder_mod"]["conv1"]["weight_bar"])
    np.testing.assert_allclose(j, np.transpose(t, (2, 3, 1, 0)), rtol=1e-6)

    # HF snapshot-directory layout
    snap = tmp_path / "snapshot"
    snap.mkdir()
    torch.save(ref.state_dict(), str(snap / "pytorch_model.bin"))
    cfg.model.weights = str(snap)
    variables2 = load_model_weights(model, cfg)
    j2 = np.asarray(variables2["params"]["encoder_mod"]["conv1"]["weight_bar"])
    np.testing.assert_allclose(j2, j, rtol=0)
