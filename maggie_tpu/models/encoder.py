"""GCA-style ResNet-D encoders with shortcut branches and instance-mask ID embedding.

Rebuilds reference ``maggie/network/encoder/resnet.py``:
- ``ResNetD`` — 3-conv stem + BasicBlock stages [3,4,4,2] with SpectralNorm on every
  conv (``resnet.py:42-153``);
- ``ResShortCutD`` — adds 5 shortcut conv branches producing os1..os16 skip features
  (``resnet.py:155-200``);
- ``ResMaskEmbedShortCutD`` — MaGGIe's encoder: instance masks -> ID embedding table,
  masked-mean over instances -> ``num_embed`` channels concatenated to RGB
  (``resnet.py:202-229``).

All tensors NHWC. Outputs: (os32 embedding NHWC, mid_fea dict with 'shortcut' tuple,
'image' and 'backbone_feat').
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from .layers import BatchNorm, ResLayerEnc, SNConv
from ..ops.resize import resize_bilinear_nhwc


class ShortcutBlock(nn.Module):
    """SNConv3x3 -> ReLU -> BN -> SNConv3x3 -> ReLU -> BN (reference ``resnet.py:167-175``,
    note the unusual ReLU-before-BN ordering).

    ``inner_mask``: inside-image 0/1 mask applied to the intermediate activation.
    When the block runs on gathered patches (the lazy os1 path), positions beyond
    the image border carry a computed value where the dense pipeline's second
    conv saw zero padding — masking the intermediate restores bit-parity."""

    planes: int

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False, update_sn: bool = False,
                 inner_mask: jax.Array | None = None) -> jax.Array:
        x = SNConv(self.planes, (3, 3), (1, 1), (1, 1), name="conv0")(x, update_sn)
        x = nn.relu(x)
        x = BatchNorm(name="bn0")(x, train)
        if inner_mask is not None:
            x = x * inner_mask.astype(x.dtype)
        x = SNConv(self.planes, (3, 3), (1, 1), (1, 1), name="conv1")(x, update_sn)
        x = nn.relu(x)
        x = BatchNorm(name="bn1")(x, train)
        return x


class ResNetD(nn.Module):
    """Plain backbone variant (reference ``res_encoder_29``): returns pyramid dict."""

    layers: tuple[int, ...] = (3, 4, 4, 2)
    mask_channel: int = 0
    late_downsample: bool = False
    s2d_stem: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False, update_sn: bool = False) -> dict:
        midplanes = 64 if self.late_downsample else 32
        s = [1, 2, 1, 2] if self.late_downsample else [2, 1, 2, 1]
        out = {}
        x = SNConv(32, (3, 3), (s[0], s[0]), (1, 1), name="conv1",
                   s2d=self.s2d_stem)(x, update_sn)
        x = BatchNorm(name="bn1")(x, train)
        x0 = nn.relu(x)
        out["os1"] = resize_bilinear_nhwc(x0, (x0.shape[1] * 2, x0.shape[2] * 2), align_corners=True)
        x = SNConv(midplanes, (3, 3), (s[1], s[1]), (1, 1), name="conv2")(x0, update_sn)
        x = BatchNorm(name="bn2")(x, train)
        x1 = nn.relu(x)
        out["os2"] = x1
        x = SNConv(64, (3, 3), (s[2], s[2]), (1, 1), name="conv3")(x1, update_sn)
        x = BatchNorm(name="bn3")(x, train)
        x2 = nn.relu(x)
        x3 = ResLayerEnc(64, self.layers[0], s[3], name="layer1")(x2, train, update_sn)
        out["os4"] = x3
        x4 = ResLayerEnc(128, self.layers[1], 2, name="layer2")(x3, train, update_sn)
        out["os8"] = x4
        x5 = ResLayerEnc(256, self.layers[2], 2, name="layer3")(x4, train, update_sn)
        out["os16"] = x5
        x6 = ResLayerEnc(512, self.layers[3], 2, name="layer_bottleneck")(x5, train, update_sn)
        out["os32"] = x6
        return out


class ResShortCutD(nn.Module):
    """Encoder with shortcut branches (reference ``ResShortCut_D.forward``,
    ``resnet.py:177-200``). Input NHWC with 3+num_mask channels.

    ``lazy_os1_shortcut``: at eval, skip the dense full-resolution os1 shortcut
    branch and instead hand the decoder a deferred function that runs
    ``shortcut_0`` on gathered patches. The os1 branch is two 3x3 convs over the
    full 576x1024 map — the single most expensive stage of the whole eval
    forward (~5.9 of 14.6 ms/frame on v5e, tools/trace_forward.py) — while the
    block-sparse ladder only ever reads it at the selected detail blocks. Eval
    BNs are pointwise, so patch results equal the dense interior exactly.
    Training keeps the dense branch (BN batch statistics span the full map)."""

    layers: tuple[int, ...] = (3, 4, 4, 2)
    num_mask: int = 1
    late_downsample: bool = False
    lazy_os1_shortcut: bool = False
    lazy_os2_shortcut: bool = False
    s2d_stem: bool = False

    def setup(self):
        midplanes = 64 if self.late_downsample else 32
        s = [1, 2, 1, 2] if self.late_downsample else [2, 1, 2, 1]
        self._s = s
        self.conv1 = SNConv(32, (3, 3), (s[0], s[0]), (1, 1), name="conv1",
                            s2d=self.s2d_stem)
        self.bn1 = BatchNorm(name="bn1")
        self.conv2 = SNConv(midplanes, (3, 3), (s[1], s[1]), (1, 1), name="conv2")
        self.bn2 = BatchNorm(name="bn2")
        self.conv3 = SNConv(64, (3, 3), (s[2], s[2]), (1, 1), name="conv3")
        self.bn3 = BatchNorm(name="bn3")
        self.layer1 = ResLayerEnc(64, self.layers[0], s[3], name="layer1")
        self.layer2 = ResLayerEnc(128, self.layers[1], 2, name="layer2")
        self.layer3 = ResLayerEnc(256, self.layers[2], 2, name="layer3")
        self.layer_bottleneck = ResLayerEnc(512, self.layers[3], 2,
                                            name="layer_bottleneck")
        self.shortcut_0 = ShortcutBlock(32, name="shortcut_0")
        self.shortcut_1 = ShortcutBlock(midplanes, name="shortcut_1")
        self.shortcut_2 = ShortcutBlock(64, name="shortcut_2")
        self.shortcut_3 = ShortcutBlock(128, name="shortcut_3")
        self.shortcut_4 = ShortcutBlock(256, name="shortcut_4")

    def __call__(self, x: jax.Array, train: bool = False, update_sn: bool = False):
        inp = x
        out = self.conv1(x, update_sn)
        out = self.bn1(out, train)
        out = nn.relu(out)
        out = self.conv2(out, update_sn)
        out = self.bn2(out, train)
        x1 = nn.relu(out)
        out = self.conv3(x1, update_sn)
        out = self.bn3(out, train)
        out = nn.relu(out)

        x2 = self.layer1(out, train, update_sn)
        x3 = self.layer2(x2, train, update_sn)
        x4 = self.layer3(x3, train, update_sn)
        out = self.layer_bottleneck(x4, train, update_sn)

        mid_fea = {}
        if self.lazy_os1_shortcut and not train:
            fea1 = None
            mid_fea["shortcut0_fn"] = (
                lambda patches, inner_mask=None: self.shortcut_0(
                    patches, train, update_sn, inner_mask))
            mid_fea["shortcut0_input"] = inp
        else:
            fea1 = self.shortcut_0(inp, train, update_sn)
        if self.lazy_os2_shortcut and not train:
            # same move one octave up (round 5): the block ladder reads the os2
            # skip features only at gathered 36x36 windows of active blocks —
            # defer the two 288x512x32 shortcut_1 convs (~0.33 ms/frame of the
            # round-4 eval trace) to patch domain in the decoder
            fea2 = None
            mid_fea["shortcut1_fn"] = (
                lambda patches, inner_mask=None: self.shortcut_1(
                    patches, train, update_sn, inner_mask))
            mid_fea["shortcut1_input"] = x1
        else:
            fea2 = self.shortcut_1(x1, train, update_sn)
        fea3 = self.shortcut_2(x2, train, update_sn)
        fea4 = self.shortcut_3(x3, train, update_sn)
        fea5 = self.shortcut_4(x4, train, update_sn)

        # stage tags: with remat="selective" (engine/train_step.py) exactly these
        # boundary activations are stored; backward recomputes within stages
        from jax.ad_checkpoint import checkpoint_name
        fea3, fea4, fea5 = (
            checkpoint_name(f, "stage") for f in (fea3, fea4, fea5))
        if fea1 is not None:
            fea1 = checkpoint_name(fea1, "stage")
        if fea2 is not None:
            fea2 = checkpoint_name(fea2, "stage")
        mid_fea.update({
            "shortcut": (fea1, fea2, fea3, fea4, fea5),
            "image": inp[..., :3],
            "backbone_feat": (x2, x3, x4, out),
        })
        return checkpoint_name(out, "stage"), mid_fea


class ResMaskEmbedShortCutD(nn.Module):
    """MaGGIe encoder (reference ``ResMaskEmbedShortCut_D``, ``resnet.py:202-229``).

    Input x: NHWC with channels [RGB | num_mask binary instance masks]. The masks are
    painted with instance IDs, embedded via a (num_mask+1, num_embed) table, and the
    masked mean over instances is concatenated to RGB.
    """

    layers: tuple[int, ...] = (3, 4, 4, 2)
    num_mask: int = 10
    num_embed: int = 3
    late_downsample: bool = False
    lazy_os1_shortcut: bool = False
    lazy_os2_shortcut: bool = False
    s2d_stem: bool = False

    def setup(self):
        # setup-style (not @nn.compact) so ``backbone`` is reachable from
        # MaGGIe.decode_window, which re-binds the lazy os1-shortcut closure
        # over cached encoder inputs (models/maggie.py). Param paths unchanged.
        if self.num_embed > 0:
            self.mask_embed_layer = nn.Embed(
                self.num_mask + 1, self.num_embed,
                embedding_init=nn.initializers.xavier_uniform())
        self.backbone = ResShortCutD(self.layers, num_mask=self.num_embed,
                                     late_downsample=self.late_downsample,
                                     lazy_os1_shortcut=self.lazy_os1_shortcut,
                                     lazy_os2_shortcut=self.lazy_os2_shortcut,
                                     s2d_stem=self.s2d_stem)

    def __call__(self, x: jax.Array, train: bool = False, update_sn: bool = False):
        inp = x[..., :3]
        if self.num_embed > 0:
            masks = x[..., 3:]  # (N, H, W, n_m), binary by contract
            n_m = masks.shape[-1]
            table = self.mask_embed_layer
            # The reference gathers table[ids] with ids = mask_j * (j+1) and then
            # masked-means over instances excluding id 0 (resnet.py:218-226). For
            # binary masks that reduces to a LINEAR map — sum_j mask_j * table[j+1]
            # over sum_j mask_j — one small matmul instead of a 5.9M-row gather
            # (the gather alone was ~20 ms/frame at 576x1024 on v5e).
            # Binarize at the boundary: the linearization is only exact for 0/1
            # masks; a fractional value (e.g. from an interpolated resize) would
            # silently blend embeddings where the reference's id-gather floors.
            m = (masks > 0.5).astype(jnp.float32)
            emb = jnp.einsum("nhwm,me->nhwe", m, table.embedding[1:n_m + 1])
            emb = emb / (m.sum(axis=-1, keepdims=True) + 1e-6)  # (N, H, W, num_embed)
            inp = jnp.concatenate([inp, emb.astype(inp.dtype)], axis=-1)
        return self.backbone(inp, train, update_sn)


ENCODER_OUT_CHANNELS = {"os1": 32, "os2": 32, "os4": 64, "os8": 128, "os16": 256, "os32": 512}
