"""LPN: SparseMat's low-resolution prediction network (reference
``maggie/network/encoder/lpn.py``): MobileNetV2 backbone + MODNet-style HLBranch
decoder with an SE block; returns (fused sigmoid alpha, dec16x context features)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from .layers import BatchNorm, Conv
from .mobilenetv2 import MobileNetV2Backbone
from ..ops.resize import resize_bilinear_nhwc


def _upsample_like(src, tar):
    return resize_bilinear_nhwc(src, (tar.shape[1], tar.shape[2]), align_corners=False)


class IBNorm(nn.Module):
    """Half BatchNorm / half InstanceNorm(affine=False) (reference ``lpn.py:13-33``)."""

    @nn.compact
    def __call__(self, x, train=False):
        c = x.shape[-1]
        half = c // 2
        bn = BatchNorm(name="bnorm")(x[..., :half], train)
        inx = x[..., half:]
        mean = jnp.mean(inx, axis=(1, 2), keepdims=True)
        var = jnp.var(inx, axis=(1, 2), keepdims=True)
        instn = (inx - mean) * jax.lax.rsqrt(var + 1e-5)
        return jnp.concatenate([bn, instn], axis=-1)


class ConvIBNRelu(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    padding: int = 0
    with_ibn: bool = True
    with_relu: bool = True

    @nn.compact
    def __call__(self, x, train=False):
        x = Conv(self.features, (self.kernel,) * 2, (self.stride,) * 2,
                 (self.padding,) * 2, name="conv")(x)
        if self.with_ibn:
            x = IBNorm(name="ibn")(x, train)
        if self.with_relu:
            x = nn.relu(x)
        return x


class SEBlock(nn.Module):
    out_channels: int
    reduction: int = 1

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        w = jnp.mean(x, axis=(1, 2))
        w = nn.Dense(c // self.reduction, use_bias=False, name="fc1")(w)
        w = nn.relu(w)
        w = nn.Dense(self.out_channels, use_bias=False, name="fc2")(w)
        w = nn.sigmoid(w)
        return x * w[:, None, None, :]


class HLBranch(nn.Module):
    """MODNet high-level branch (reference ``lpn.py:86-160``)."""

    in_channels: int
    hr_channels: int

    @nn.compact
    def __call__(self, img, enc2x, enc4x, enc8x, enc16x, enc32x, train=False):
        hr = self.hr_channels
        enc32x = SEBlock(enc32x.shape[-1], reduction=4, name="se_block")(enc32x)
        p32x = ConvIBNRelu(1, 1, with_ibn=False, with_relu=False, name="p32x")(enc32x, train)
        p32x = _upsample_like(p32x, img)

        dec16x = resize_bilinear_nhwc(enc32x, (enc32x.shape[1] * 2, enc32x.shape[2] * 2))
        dec16x = ConvIBNRelu(2 * hr, 3, padding=1, name="conv_dec16x_0")(
            jnp.concatenate([dec16x, enc16x], -1), train)
        dec16x = ConvIBNRelu(hr, 3, padding=1, name="conv_dec16x_1")(dec16x, train)
        p16x = ConvIBNRelu(1, 1, with_ibn=False, with_relu=False, name="p16x")(
            jnp.concatenate([dec16x, _upsample_like(p32x, dec16x)], -1), train)
        p16x = _upsample_like(p16x, img)

        dec8x = resize_bilinear_nhwc(dec16x, (dec16x.shape[1] * 2, dec16x.shape[2] * 2))
        dec8x = ConvIBNRelu(2 * hr, 3, padding=1, name="conv_dec8x_0")(
            jnp.concatenate([dec8x, enc8x], -1), train)
        dec8x = ConvIBNRelu(hr, 3, padding=1, name="conv_dec8x_1")(dec8x, train)
        p8x = ConvIBNRelu(1, 1, with_ibn=False, with_relu=False, name="p8x")(
            jnp.concatenate([dec8x, _upsample_like(p16x, dec8x)], -1), train)
        p8x = _upsample_like(p8x, img)

        dec4x = resize_bilinear_nhwc(dec8x, (dec8x.shape[1] * 2, dec8x.shape[2] * 2))
        dec4x = ConvIBNRelu(2 * hr, 3, padding=1, name="conv_dec4x_0")(
            jnp.concatenate([dec4x, enc4x], -1), train)
        dec4x = ConvIBNRelu(hr, 3, padding=1, name="conv_dec4x_1")(dec4x, train)
        p4x = ConvIBNRelu(1, 1, with_ibn=False, with_relu=False, name="p4x")(dec4x, train)
        p4x = _upsample_like(p4x, img)

        dec2x = resize_bilinear_nhwc(dec4x, (dec4x.shape[1] * 2, dec4x.shape[2] * 2))
        dec2x = ConvIBNRelu(2 * hr, 3, padding=1, name="conv_dec2x_0")(
            jnp.concatenate([dec2x, enc2x], -1), train)
        dec2x = ConvIBNRelu(hr, 3, padding=1, name="conv_dec2x_1")(dec2x, train)
        dec2x = ConvIBNRelu(hr, 3, padding=1, name="conv_dec2x_2")(dec2x, train)
        p2x = ConvIBNRelu(1, 1, with_ibn=False, with_relu=False, name="p2x")(
            jnp.concatenate([dec2x, _upsample_like(p4x, dec2x)], -1), train)
        p2x = _upsample_like(p2x, img)

        dec1x = resize_bilinear_nhwc(dec2x, (dec2x.shape[1] * 2, dec2x.shape[2] * 2))
        dec1x = ConvIBNRelu(hr, 3, padding=1, name="conv_dec1x_0")(
            jnp.concatenate([dec1x, img], -1), train)
        p1x = ConvIBNRelu(1, 1, with_ibn=False, with_relu=False, name="p1x")(
            jnp.concatenate([dec1x, _upsample_like(p2x, dec1x)], -1), train)

        p0x = ConvIBNRelu(1, 1, with_ibn=False, with_relu=False, name="p0x")(
            jnp.concatenate([p1x, _upsample_like(p8x, p1x)], -1), train)

        fus_out = nn.sigmoid(p0x)
        return fus_out, dec16x


class LPN(nn.Module):
    """Reference ``LPN`` (lpn.py:196-206): returns (sigmoid alpha at full res of the
    lr input, dec16x context)."""

    mid_chn: int = 32

    @nn.compact
    def __call__(self, images, train=False):
        enc2x, enc4x, enc8x, enc16x, enc32x = MobileNetV2Backbone(name="backbone")(images, train)
        return HLBranch(images.shape[-1], self.mid_chn, name="decoder")(
            images, enc2x, enc4x, enc8x, enc16x, enc32x, train)
