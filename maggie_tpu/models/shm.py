"""SHM: SparseMat's sparse refinement module (reference ``decoder/shm.py`` +
``decoder/sparse_resnet_bn.py``), in dense-masked form.

A sparse ResNet-18 runs over the gathered uncertainty pixels (RGB + normalized
lr_pred, 4 channels), a ``SparseCAM`` global fg/bg context gates the bottleneck,
and a 3-step inverse-conv decoder (reusing the forward index books) emits
multi-scale sigmoid alpha heads. Active-set bookkeeping mirrors the spconv
``indice_key`` pairing: m1 --conv2(s2)--> m2 --layer1(s2)--> m4 --layer2(s2)--> m8;
layer3/4 are submanifold (stride 1, layer4 dilation 2) on m8.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from .layers import Conv
from .sparse_layers import MaskedBatchNorm, SparseInverseConv, SubMConv, active_mask_downsample
from ..ops.resize import resize_bilinear_nhwc


class SubMConvD(nn.Module):
    """Submanifold conv with dilation (sparse_resnet layer4 uses dilation=2)."""

    features: int
    kernel_size: int = 3
    dilation: int = 1
    use_bias: bool = False

    @nn.compact
    def __call__(self, x, mask):
        k, d = self.kernel_size, self.dilation
        pad = d * (k // 2)
        kernel = self.param("weight", nn.initializers.xavier_uniform(),
                            (k, k, x.shape[-1], self.features))
        xm = x * mask.astype(x.dtype)
        y = jax.lax.conv_general_dilated(
            xm, kernel.astype(xm.dtype), (1, 1), [(pad, pad), (pad, pad)],
            rhs_dilation=(d, d), dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (self.features,)).astype(y.dtype)
        return y * mask.astype(y.dtype)


class StridedSparseConv(nn.Module):
    """k=3 s=2 p=1 SparseConv2d: output active set = maxpool(k3,s2,p1)(mask)."""

    features: int
    use_bias: bool = False

    @nn.compact
    def __call__(self, x, mask):
        kernel = self.param("weight", nn.initializers.xavier_uniform(),
                            (3, 3, x.shape[-1], self.features))
        xm = x * mask.astype(x.dtype)
        y = jax.lax.conv_general_dilated(
            xm, kernel.astype(xm.dtype), (2, 2), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (self.features,)).astype(y.dtype)
        m_out = active_mask_downsample(mask)
        return y * m_out.astype(y.dtype), m_out


class SparseBasicBlock(nn.Module):
    """sparse_resnet_bn BasicBlock (``:40-75``)."""

    planes: int
    stride: int = 1
    dilation: int = 1
    has_downsample: bool = False

    @nn.compact
    def __call__(self, x, mask, train=False):
        if self.stride == 2:
            out, m_out = StridedSparseConv(self.planes, name="conv1")(x, mask)
        else:
            out = SubMConvD(self.planes, 3, self.dilation, name="conv1")(x, mask)
            m_out = mask
        out = nn.relu(MaskedBatchNorm(name="bn1")(out, m_out, train))
        out = SubMConv(self.planes, 3, use_bias=True, name="conv2")(out, m_out)
        out = MaskedBatchNorm(name="bn2")(out, m_out, train)
        if self.has_downsample:
            if self.stride == 2:
                res, _ = StridedSparseConv(self.planes, name="downsample_conv")(x, mask)
            else:
                res = SubMConvD(self.planes, 3, 1, name="downsample_conv")(x, mask)
            res = MaskedBatchNorm(name="downsample_bn")(res, m_out, train)
        else:
            res = x
        return nn.relu(out + res) * m_out, m_out


class SparseResNet18(nn.Module):
    """Reference ``SparseResNet18`` (sparse_resnet_bn.py:121-200), stride=8 config:
    layer1/layer2 stride 2, layer3 stride 1, layer4 stride 1 dilation 2."""

    @nn.compact
    def __call__(self, x, m1, train=False):
        outs = []
        z = SubMConv(64, 3, name="conv1")(x, m1)
        z = nn.relu(MaskedBatchNorm(name="bn1")(z, m1, train))
        z, m2 = StridedSparseConv(64, name="conv2")(z, m1)
        z = nn.relu(MaskedBatchNorm(name="bn2")(z, m2, train))
        z = SubMConv(64, 3, name="conv3")(z, m2)
        z = nn.relu(MaskedBatchNorm(name="bn3")(z, m2, train))
        outs.append((z, m2))

        def layer(z, m, planes, blocks, stride, dilation, name):
            z, m = SparseBasicBlock(planes, stride, dilation, has_downsample=True,
                                    name=f"{name}_block0")(z, m, train)
            for i in range(1, blocks):
                z, m = SparseBasicBlock(planes, 1, 1,
                                        has_downsample=False,
                                        name=f"{name}_block{i}")(z, m, train)
            return z, m

        z, m4 = layer(z, m2, 64, 2, 2, 1, "layer1")
        outs.append((z, m4))
        z, m8 = layer(z, m4, 128, 2, 2, 1, "layer2")
        outs.append((z, m8))
        # stride=8: layer3 stride 1 (needs downsample for channel change)
        z, _ = layer(z, m8, 256, 2, 1, 1, "layer3")
        outs.append((z, m8))
        z, _ = layer(z, m8, 512, 2, 1, 2, "layer4")
        outs.append((z, m8))
        return outs


class SparseCAM(nn.Module):
    """Global fg/bg context gating (reference ``decoder/shm.py:56-76``)."""

    local_inc: int = 512
    global_inc: int = 32

    @nn.compact
    def __call__(self, x, mask_active, ctx, lr_pred, train=False):
        # ctx: (B, h16, w16, 32); lr_pred (B, H, W, 1) -> resized to ctx size
        mask_lr = resize_bilinear_nhwc(lr_pred, (ctx.shape[1], ctx.shape[2]), align_corners=False)
        fg = jnp.mean(ctx * mask_lr, axis=(1, 2), keepdims=True)
        bg = jnp.mean(ctx * (1 - mask_lr), axis=(1, 2), keepdims=True)
        fg = nn.relu(Conv(self.global_inc, (1, 1), (1, 1), (0, 0), name="conv_f")(fg))
        bg = nn.relu(Conv(self.global_inc, (1, 1), (1, 1), (0, 0), name="conv_b")(bg))
        w = nn.sigmoid(Conv(self.local_inc, (1, 1), (1, 1), (0, 0), name="conv_g")(
            jnp.concatenate([fg, bg], -1)))  # (B, 1, 1, local_inc)
        return x * w * mask_active


class SparseDecoder3_18(nn.Module):
    """Inverse-conv decoder with multi-scale sigmoid heads (reference
    ``decoder/shm.py:84-148``)."""

    @nn.compact
    def __call__(self, img_feats, m1, conv_out, train=False):
        (x1, m2), (x2, m4), (x3, m8), (x4, _), (x5, _) = conv_out

        lrelu = lambda z: nn.leaky_relu(z, 0.01)
        d4 = SparseInverseConv(256, use_bias=True, name="conv_up1")(x5, m8, m4)
        d4 = lrelu(MaskedBatchNorm(name="conv_up1_bn")(d4, m4, train))
        p4 = SubMConv(1, 1, name="conv_p8x")(d4, m4)

        d2 = SparseInverseConv(256, use_bias=True, name="conv_up2")(
            jnp.concatenate([d4, x2], -1), m4, m2)
        d2 = lrelu(MaskedBatchNorm(name="conv_up2_bn")(d2, m2, train))
        p2 = SubMConv(1, 1, name="conv_p4x")(d2, m2)

        d1 = SparseInverseConv(64, use_bias=True, name="conv_up3")(
            jnp.concatenate([d2, x1], -1), m2, m1)
        d1 = lrelu(MaskedBatchNorm(name="conv_up3_bn")(d1, m1, train))
        p1 = SubMConv(1, 1, name="conv_p2x")(d1, m1)

        rgb = (img_feats[..., :3] * 0.5 + 0.5) * m1
        z = jnp.concatenate([d1, rgb], -1)
        z = lrelu(SubMConv(32, 3, use_bias=True, name="alpha_conv1")(z, m1))
        z = lrelu(SubMConv(16, 3, use_bias=True, name="alpha_conv2")(z, m1))
        p0 = SubMConv(1, 1, name="alpha_conv3")(z, m1)

        # densified sigmoids; inactive sites are exactly sigmoid-masked to 0 by the
        # caller's mask-combine, matching .dense() + masked blend in the reference
        return [nn.sigmoid(p4) * m4, nn.sigmoid(p2) * m2,
                nn.sigmoid(p1) * m1, nn.sigmoid(p0) * m1]


class SHM(nn.Module):
    """Reference ``SHM`` (decoder/shm.py:151-166)."""

    inc: int = 4

    @nn.compact
    def __call__(self, sparse_inputs, lr_pred, m1, ctx, train=False):
        """sparse_inputs: (B, H, W, 4) dense-masked [rgb | normalized lr_pred];
        lr_pred (B, H, W, 1); m1 (B, H, W, 1) active mask; ctx (B, h16, w16, 32)."""
        feats = SparseResNet18(name="backbone")(sparse_inputs, m1, train)
        x5, m8 = feats[-1]
        x5 = SparseCAM(512, ctx.shape[-1], name="ctx")(x5, m8, ctx, lr_pred, train)
        feats[-1] = (x5, m8)
        return SparseDecoder3_18(name="decoder")(sparse_inputs, m1, feats, train)
