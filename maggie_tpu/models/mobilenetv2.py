"""MobileNetV2 backbone (reference ``maggie/network/encoder/mobilenetv2.py``),
NHWC. Stage split [0:2][2:4][4:7][7:14][14:19] -> enc channels [16,24,32,96,1280]."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from .layers import BatchNorm, Conv


def _make_divisible(v, divisor=8, min_value=None):
    if min_value is None:
        min_value = divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def relu6(x):
    return jnp.minimum(nn.relu(x), 6.0)


class ConvBN(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1

    @nn.compact
    def __call__(self, x, train=False):
        pad = 1 if self.kernel == 3 else 0
        x = Conv(self.features, (self.kernel,) * 2, (self.stride,) * 2, (pad, pad),
                 use_bias=False, name="conv")(x)
        x = BatchNorm(name="bn")(x, train)
        return relu6(x)


class InvertedResidual(nn.Module):
    """Reference ``InvertedResidual`` (mobilenetv2.py:58-116), with_norm=True path."""

    oup: int
    stride: int
    expansion: int

    @nn.compact
    def __call__(self, x, train=False):
        inp = x.shape[-1]
        hidden = round(inp * self.expansion)
        use_res = self.stride == 1 and inp == self.oup
        y = x
        if self.expansion != 1:
            y = Conv(hidden, (1, 1), (1, 1), (0, 0), use_bias=False, name="pw")(y)
            y = BatchNorm(name="pw_bn")(y, train)
            y = relu6(y)
        y = Conv(hidden, (3, 3), (self.stride,) * 2, (1, 1), use_bias=False,
                 feature_group_count=hidden, name="dw")(y)
        y = BatchNorm(name="dw_bn")(y, train)
        y = relu6(y)
        y = Conv(self.oup, (1, 1), (1, 1), (0, 0), use_bias=False, name="pw_linear")(y)
        y = BatchNorm(name="pw_linear_bn")(y, train)
        return x + y if use_res else y


class MobileNetV2Backbone(nn.Module):
    alpha: float = 1.0
    expansion: int = 6

    @nn.compact
    def __call__(self, x, train=False):
        setting = [
            (1, 16, 1, 1), (self.expansion, 24, 2, 2), (self.expansion, 32, 3, 2),
            (self.expansion, 64, 4, 2), (self.expansion, 96, 3, 1),
            (self.expansion, 160, 3, 2), (self.expansion, 320, 1, 1),
        ]
        feats = []
        x = ConvBN(_make_divisible(32 * self.alpha), 3, 2, name="features_0")(x, train)
        idx = 1
        blocks = []
        for t, c, n, s in setting:
            out_ch = _make_divisible(int(c * self.alpha))
            for i in range(n):
                blocks.append((idx, out_ch, s if i == 0 else 1, t))
                idx += 1
        for bidx, out_ch, stride, t in blocks:
            x = InvertedResidual(out_ch, stride, t, name=f"features_{bidx}")(x, train)
            if bidx == 1:
                feats.append(x)  # enc2x
            elif bidx == 3:
                feats.append(x)  # enc4x
            elif bidx == 6:
                feats.append(x)  # enc8x
            elif bidx == 13:
                feats.append(x)  # enc16x
        x = ConvBN(1280, 1, 1, name=f"features_{idx}")(x, train)
        feats.append(x)  # enc32x
        return feats
