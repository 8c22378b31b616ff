"""MaGGIe torch-checkpoint -> flax-tree converter (numpy-only core).

Moved from tools/convert_torch_ckpt.py so the package can load released torch
checkpoints directly (the reference loads file-or-HF-hub in-package,
``maggie/network/__init__.py:7-13``); the tools script remains as the CLI.
See that file's docstring for the key-mapping rules.
"""

from __future__ import annotations

import re

import numpy as np


def conv_w(t):  # (O,I,kh,kw) -> (kh,kw,I,O)
    return np.transpose(t, (2, 3, 1, 0))


def convT_w(t):  # (I,O,kh,kw) -> (kh,kw,I,O)
    return np.transpose(t, (2, 3, 0, 1))


def spconv_w(t):
    """spconv2 stores (O, kh, kw, I); spconv1 stored (kh, kw, I, O)."""
    if t.ndim != 4:
        return t
    # heuristics: HWIO already if first two dims equal (kernel) and small
    if t.shape[0] == t.shape[1] and t.shape[0] <= 7:
        return t
    return np.transpose(t, (1, 2, 3, 0))


def linear_w(t):
    return np.transpose(t, (1, 0))


class Converter:
    def __init__(self):
        self.params: dict[str, np.ndarray] = {}
        self.batch_stats: dict[str, np.ndarray] = {}
        self.spectral: dict[str, np.ndarray] = {}
        self.skipped: list[str] = []

    def put(self, coll: str, path: str, value: np.ndarray):
        getattr(self, coll)[path] = value

    def bn(self, src: dict, tkey: str, dst: str, masked: bool = False):
        """torch BN 'tkey.{weight,bias,running_mean,running_var}' -> dst.

        Dense BN wraps flax nn.BatchNorm under '<dst>/bn'; MaskedBatchNorm holds
        scale/bias directly.
        """
        sub = dst if masked else f"{dst}/bn"
        if f"{tkey}.weight" in src:
            self.put("params", f"{sub}/scale", src.pop(f"{tkey}.weight"))
            self.put("params", f"{sub}/bias", src.pop(f"{tkey}.bias"))
            self.put("batch_stats", f"{sub}/mean", src.pop(f"{tkey}.running_mean"))
            self.put("batch_stats", f"{sub}/var", src.pop(f"{tkey}.running_var"))
            src.pop(f"{tkey}.num_batches_tracked", None)

    def snconv(self, src: dict, tkey: str, dst: str, transpose=conv_w, u_axis0=True):
        """SpectralNorm(Conv) 'tkey.module.{weight_bar,weight_u,weight_v}'."""
        if f"{tkey}.module.weight_bar" in src:
            self.put("params", f"{dst}/weight_bar", transpose(src.pop(f"{tkey}.module.weight_bar")))
            self.put("spectral", f"{dst}/u", src.pop(f"{tkey}.module.weight_u"))
            self.put("spectral", f"{dst}/v", src.pop(f"{tkey}.module.weight_v"))
            if f"{tkey}.module.bias" in src:
                self.put("params", f"{dst}/bias", src.pop(f"{tkey}.module.bias"))

    def conv(self, src: dict, tkey: str, dst: str, transpose=conv_w):
        if f"{tkey}.weight" in src:
            self.put("params", f"{dst}/weight", transpose(src.pop(f"{tkey}.weight")))
            if f"{tkey}.bias" in src:
                self.put("params", f"{dst}/bias", src.pop(f"{tkey}.bias"))

    def dense(self, src: dict, tkey: str, dst: str):
        if f"{tkey}.weight" in src:
            self.put("params", f"{dst}/kernel", linear_w(src.pop(f"{tkey}.weight")))
            if f"{tkey}.bias" in src:
                self.put("params", f"{dst}/bias", src.pop(f"{tkey}.bias"))

    def layer_norm(self, src: dict, tkey: str, dst: str):
        if f"{tkey}.weight" in src:
            self.put("params", f"{dst}/scale", src.pop(f"{tkey}.weight"))
            self.put("params", f"{dst}/bias", src.pop(f"{tkey}.bias"))

    def mha(self, src: dict, tkey: str, dst: str):
        if f"{tkey}.in_proj_weight" in src:
            self.put("params", f"{dst}/in_proj_weight", src.pop(f"{tkey}.in_proj_weight"))
            self.put("params", f"{dst}/in_proj_bias", src.pop(f"{tkey}.in_proj_bias"))
            self.put("params", f"{dst}/out_proj_weight", src.pop(f"{tkey}.out_proj.weight"))
            self.put("params", f"{dst}/out_proj_bias", src.pop(f"{tkey}.out_proj.bias"))

    def embed(self, src: dict, tkey: str, dst: str):
        if f"{tkey}.weight" in src:
            self.put("params", f"{dst}/embedding", src.pop(f"{tkey}.weight"))

    # ---- composite blocks ----

    def enc_basic_block(self, src: dict, tkey: str, dst: str):
        self.snconv(src, f"{tkey}.conv1", f"{dst}/conv1")
        self.bn(src, f"{tkey}.bn1", f"{dst}/bn1")
        self.snconv(src, f"{tkey}.conv2", f"{dst}/conv2")
        self.bn(src, f"{tkey}.bn2", f"{dst}/bn2")
        # encoder downsample: stride!=1 -> Sequential(AvgPool, SNConv, BN) = .1/.2;
        # stride==1 channel change -> Sequential(SNConv, BN) = .0/.1
        if f"{tkey}.downsample.1.module.weight_bar" in src:
            self.snconv(src, f"{tkey}.downsample.1", f"{dst}/downsample_conv")
            self.bn(src, f"{tkey}.downsample.2", f"{dst}/downsample_bn")
        elif f"{tkey}.downsample.0.module.weight_bar" in src:
            self.snconv(src, f"{tkey}.downsample.0", f"{dst}/downsample_conv")
            self.bn(src, f"{tkey}.downsample.1", f"{dst}/downsample_bn")

    def dec_basic_block(self, src: dict, tkey: str, dst: str, stride: int):
        tr = convT_w if stride > 1 else conv_w
        self.snconv(src, f"{tkey}.conv1", f"{dst}/conv1", transpose=tr)
        self.bn(src, f"{tkey}.bn1", f"{dst}/bn1")
        self.snconv(src, f"{tkey}.conv2", f"{dst}/conv2")
        self.bn(src, f"{tkey}.bn2", f"{dst}/bn2")
        # decoder upsample: stride>1 -> Sequential(UpNearest, SNConv, BN) = .1/.2
        if f"{tkey}.upsample.1.module.weight_bar" in src:
            self.snconv(src, f"{tkey}.upsample.1", f"{dst}/upsample_conv")
            self.bn(src, f"{tkey}.upsample.2", f"{dst}/upsample_bn")
        elif f"{tkey}.upsample.0.module.weight_bar" in src:
            self.snconv(src, f"{tkey}.upsample.0", f"{dst}/upsample_conv")
            self.bn(src, f"{tkey}.upsample.1", f"{dst}/upsample_bn")

    def res_layer(self, src: dict, tkey: str, dst: str, blocks: int, enc: bool, stride: int = 2):
        for i in range(blocks):
            if enc:
                self.enc_basic_block(src, f"{tkey}.{i}", f"{dst}/block{i}")
            else:
                self.dec_basic_block(src, f"{tkey}.{i}", f"{dst}/block{i}",
                                     stride if i == 0 else 1)

    def shortcut(self, src: dict, tkey: str, dst: str):
        self.snconv(src, f"{tkey}.0", f"{dst}/conv0")
        self.bn(src, f"{tkey}.2", f"{dst}/bn0")
        self.snconv(src, f"{tkey}.3", f"{dst}/conv1")
        self.bn(src, f"{tkey}.5", f"{dst}/bn1")

    def aspp(self, src: dict, tkey: str, dst: str):
        for i in range(1, 6):
            self.conv(src, f"{tkey}.aspp{i}", f"{dst}/aspp{i}")
            self.bn(src, f"{tkey}.aspp{i}_bn", f"{dst}/aspp{i}_bn")
        self.conv(src, f"{tkey}.conv2", f"{dst}/conv2")
        self.bn(src, f"{tkey}.bn2", f"{dst}/bn2")

    def instance_matte_decoder(self, src: dict, tkey: str, dst: str, n_block: int = 2):
        self.dense(src, f"{tkey}.feat_proj.layers.0", f"{dst}/feat_proj/layer0")
        for i in range(n_block):
            self.mha(src, f"{tkey}.sa_layers.{i}.self_attn", f"{dst}/sa_{i}/self_attn")
            self.layer_norm(src, f"{tkey}.sa_layers.{i}.norm", f"{dst}/sa_{i}/norm/ln")
            self.mha(src, f"{tkey}.token_feat_ca_layers.{i}.multihead_attn",
                     f"{dst}/token_feat_ca_{i}/multihead_attn")
            self.layer_norm(src, f"{tkey}.token_feat_ca_layers.{i}.norm",
                            f"{dst}/token_feat_ca_{i}/norm/ln")
            self.dense(src, f"{tkey}.mlp_layers.{i}.linear1", f"{dst}/mlp_{i}/linear1")
            self.dense(src, f"{tkey}.mlp_layers.{i}.linear2", f"{dst}/mlp_{i}/linear2")
            self.layer_norm(src, f"{tkey}.mlp_layers.{i}.norm", f"{dst}/mlp_{i}/norm/ln")
            self.mha(src, f"{tkey}.feat_token_ca_layers.{i}.multihead_attn",
                     f"{dst}/feat_token_ca_{i}/multihead_attn")
            self.layer_norm(src, f"{tkey}.feat_token_ca_layers.{i}.norm",
                            f"{dst}/feat_token_ca_{i}/norm/ln")
        self.mha(src, f"{tkey}.final_token_feat_ca.multihead_attn",
                 f"{dst}/final_token_feat_ca/multihead_attn")
        self.layer_norm(src, f"{tkey}.final_token_feat_ca.norm",
                        f"{dst}/final_token_feat_ca/norm/ln")
        self.dense(src, f"{tkey}.final_mlp.layers.0", f"{dst}/final_mlp/layer0")
        self.layer_norm(src, f"{tkey}.decoder_norm", f"{dst}/decoder_norm")
        if f"{tkey}.query_feat.weight" in src:
            self.put("params", f"{dst}/query_feat", src.pop(f"{tkey}.query_feat.weight"))
        self.embed(src, f"{tkey}.id_embedding", f"{dst}/id_embedding")
        self.conv(src, f"{tkey}.conv.0", f"{dst}/conv_0")
        self.bn(src, f"{tkey}.conv.1", f"{dst}/conv_bn0")
        self.conv(src, f"{tkey}.conv.3", f"{dst}/conv_1")
        self.bn(src, f"{tkey}.conv.4", f"{dst}/conv_bn1")

    def spconv_layer(self, src: dict, tkey: str, dst: str, bias: bool = False):
        if f"{tkey}.weight" in src:
            w = spconv_w(src.pop(f"{tkey}.weight"))
            self.put("params", f"{dst}/weight", w)
            if f"{tkey}.bias" in src:
                self.put("params", f"{dst}/bias", src.pop(f"{tkey}.bias"))

    def sparse_decoder(self, src: dict, tkey: str, dst: str, n_block: int = 2):
        """ResShortCut_InstMattSpconv_Dec (decoder/resnet_inst_matt_spconv.py)."""
        self.res_layer(src, f"{tkey}.layer1", f"{dst}/layer1", 2, enc=False)
        self.res_layer(src, f"{tkey}.layer2", f"{dst}/layer2", 3, enc=False)
        self.instance_matte_decoder(src, f"{tkey}.refine_OS8", f"{dst}/refine_OS8_mod", n_block)
        self.dense(src, f"{tkey}.inst_spec_layer.linear1", f"{dst}/inst_spec_layer/linear1")
        self.dense(src, f"{tkey}.inst_spec_layer.linear2", f"{dst}/inst_spec_layer/linear2")
        self.layer_norm(src, f"{tkey}.inst_spec_layer.norm", f"{dst}/inst_spec_layer/norm/ln")
        # drop the index-book builder (values never used)
        for k in [k for k in src if k.startswith(f"{tkey}.dummy_downscale")]:
            src.pop(k)
            self.skipped.append(k)
        # ladders: Sequential indices from the reference definitions (:69-130)
        self.spconv_layer(src, f"{tkey}.layer3.0", f"{dst}/layer3_inv")
        self.bn(src, f"{tkey}.layer3.1", f"{dst}/layer3_bn", masked=True)
        self.spconv_layer(src, f"{tkey}.layer3.3", f"{dst}/layer3_subm")
        self.spconv_layer(src, f"{tkey}.guidance_layer.0", f"{dst}/guidance_conv1")
        self.bn(src, f"{tkey}.guidance_layer.1", f"{dst}/guidance_bn", masked=True)
        self.spconv_layer(src, f"{tkey}.guidance_layer.3", f"{dst}/guidance_conv2")
        self.spconv_layer(src, f"{tkey}.layer3_smooth.0", f"{dst}/layer3_smooth_conv")
        self.bn(src, f"{tkey}.layer3_smooth.2", f"{dst}/layer3_smooth_bn", masked=True)
        self.spconv_layer(src, f"{tkey}.layer4.0", f"{dst}/layer4_inv")
        self.bn(src, f"{tkey}.layer4.1", f"{dst}/layer4_bn", masked=True)
        self.spconv_layer(src, f"{tkey}.layer4.3", f"{dst}/layer4_subm")
        self.spconv_layer(src, f"{tkey}.layer4_smooth.0", f"{dst}/layer4_smooth_conv")
        self.bn(src, f"{tkey}.layer4_smooth.2", f"{dst}/layer4_smooth_bn", masked=True)
        self.spconv_layer(src, f"{tkey}.layer5.0", f"{dst}/layer5_inv")
        self.bn(src, f"{tkey}.layer5.1", f"{dst}/layer5_bn", masked=True)
        self.spconv_layer(src, f"{tkey}.layer5.3", f"{dst}/layer5_subm")
        self.spconv_layer(src, f"{tkey}.layer5_smooth.0", f"{dst}/layer5_smooth_conv")
        self.bn(src, f"{tkey}.layer5_smooth.2", f"{dst}/layer5_smooth_bn", masked=True)
        self.spconv_layer(src, f"{tkey}.refine_OS4.0", f"{dst}/refine_OS4_conv1")
        self.bn(src, f"{tkey}.refine_OS4.1", f"{dst}/refine_OS4_bn", masked=True)
        self.spconv_layer(src, f"{tkey}.refine_OS4.3", f"{dst}/refine_OS4_conv2")
        self.spconv_layer(src, f"{tkey}.refine_OS1.0", f"{dst}/refine_OS1_conv1")
        self.bn(src, f"{tkey}.refine_OS1.1", f"{dst}/refine_OS1_bn", masked=True)
        self.spconv_layer(src, f"{tkey}.refine_OS1.3", f"{dst}/refine_OS1_conv2")

    def refine_head(self, src: dict, tkey: str, dst: str):
        """Dense refine head: Sequential(conv.0, bn.1, lrelu, conv.3)
        (reference decoder/resnet.py:74-91)."""
        self.conv(src, f"{tkey}.0", f"{dst}/conv1")
        self.bn(src, f"{tkey}.1", f"{dst}/bn")
        self.conv(src, f"{tkey}.3", f"{dst}/conv2")

    def mgm_decoder(self, src: dict, tkey: str, dst: str):
        """ResShortCut_D_Dec (reference decoder/resnet.py:163-199, res_shortcut_22)."""
        self.res_layer(src, f"{tkey}.layer1", f"{dst}/layer1", 2, enc=False)
        self.res_layer(src, f"{tkey}.layer2", f"{dst}/layer2", 3, enc=False)
        self.res_layer(src, f"{tkey}.layer3", f"{dst}/layer3", 3, enc=False)
        self.res_layer(src, f"{tkey}.layer4", f"{dst}/layer4", 2, enc=False)
        self.snconv(src, f"{tkey}.conv1", f"{dst}/conv1", transpose=convT_w)
        self.bn(src, f"{tkey}.bn1", f"{dst}/bn1")
        for h in ("OS8", "OS4", "OS1"):
            self.refine_head(src, f"{tkey}.refine_{h}", f"{dst}/refine_{h}")

    def inst_dense_decoder(self, src: dict, tkey: str, dst: str, n_block: int = 2):
        """ResShortCut_InstMatt_Dec (reference decoder/resnet_inst_matt.py,
        res_shortcut_inst_matt_22): IMD at os8 + dense heads at os4/os1."""
        self.res_layer(src, f"{tkey}.layer1", f"{dst}/layer1", 2, enc=False)
        self.res_layer(src, f"{tkey}.layer2", f"{dst}/layer2", 3, enc=False)
        self.res_layer(src, f"{tkey}.layer3", f"{dst}/layer3", 3, enc=False)
        self.res_layer(src, f"{tkey}.layer4", f"{dst}/layer4", 2, enc=False)
        self.instance_matte_decoder(src, f"{tkey}.refine_OS8", f"{dst}/refine_OS8_mod", n_block)
        self.snconv(src, f"{tkey}.conv1", f"{dst}/conv1", transpose=convT_w)
        self.bn(src, f"{tkey}.bn1", f"{dst}/bn1")
        for h in ("OS4", "OS1"):
            self.refine_head(src, f"{tkey}.refine_{h}", f"{dst}/refine_{h}")

    def encoder(self, src: dict, tkey: str, dst: str, embed: bool):
        base = f"{dst}/backbone" if embed else dst
        if embed:
            self.embed(src, f"{tkey}.mask_embed_layer", f"{dst}/mask_embed_layer")
        for c in (1, 2, 3):
            self.snconv(src, f"{tkey}.conv{c}", f"{base}/conv{c}")
            self.bn(src, f"{tkey}.bn{c}", f"{base}/bn{c}")
        self.res_layer(src, f"{tkey}.layer1", f"{base}/layer1", 3, enc=True)
        self.res_layer(src, f"{tkey}.layer2", f"{base}/layer2", 4, enc=True)
        self.res_layer(src, f"{tkey}.layer3", f"{base}/layer3", 4, enc=True)
        self.res_layer(src, f"{tkey}.layer_bottleneck", f"{base}/layer_bottleneck", 2, enc=True)
        for i in range(5):
            self.shortcut(src, f"{tkey}.shortcut.{i}", f"{base}/shortcut_{i}")

    def maggie(self, src: dict, n_block: int = 2, video: bool = False,
               decoder: str = "res_shortcut_inst_matt_spconv_22"):
        embed = any(k.startswith("encoder.mask_embed_layer") for k in src)
        self.encoder(src, "encoder", "encoder_mod", embed)
        self.aspp(src, "aspp", "aspp_mod")
        if decoder == "res_shortcut_22":
            self.mgm_decoder(src, "decoder", "decoder_mod")
        elif decoder == "res_shortcut_inst_matt_22":
            self.inst_dense_decoder(src, "decoder", "decoder_mod", n_block)
        else:
            self.sparse_decoder(src, "decoder", "decoder_mod", n_block)
        if video:
            self.conv(src, "decoder.os8_temp_module.ih.0", "decoder_mod/os8_temp_module/ih_conv")
            self.conv(src, "decoder.os8_temp_module.hh.0", "decoder_mod/os8_temp_module/hh_conv")
            self.snconv(src, "decoder.diff_module.0", "decoder_mod/diff_module/conv1")
            self.bn(src, "decoder.diff_module.1", "decoder_mod/diff_module/bn1")
            self.snconv(src, "decoder.diff_module.3", "decoder_mod/diff_module/conv2")
            self.bn(src, "decoder.diff_module.4", "decoder_mod/diff_module/bn2")
            self.conv(src, "decoder.diff_module.6", "decoder_mod/diff_module/conv3")


def convert(state_dict: dict, video: bool = False, n_block: int = 2,
            decoder: str = "res_shortcut_inst_matt_spconv_22") -> dict[str, np.ndarray]:
    src = {k: np.asarray(v) for k, v in state_dict.items()}
    c = Converter()
    c.maggie(src, n_block=n_block, video=video, decoder=decoder)
    leftover = sorted(src.keys())
    if leftover:
        print(f"WARNING: {len(leftover)} unconverted keys, e.g. {leftover[:10]}")
    out = {}
    for coll in ("params", "batch_stats", "spectral"):
        for k, v in getattr(c, coll).items():
            out[f"{coll}/{k}"] = v
    return out
