"""ASPP module (reference ``maggie/network/module/aspp.py:8-57``): DeepLab-style
atrous pyramid, dilations [1,2,4,8] + global-pool branch, NHWC."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from .layers import BatchNorm, Conv


class ASPP(nn.Module):
    in_channels: int = 512
    out_channels: int = 512
    mid_channels: int = 256

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        m = self.mid_channels

        def branch(name, kernel, dilation):
            pad = dilation if kernel == 3 else 0
            y = Conv(m, (kernel, kernel), (1, 1), (pad, pad), (dilation, dilation),
                     use_bias=False, name=name)(x)
            y = BatchNorm(name=f"{name}_bn")(y, train)
            return nn.relu(y)

        x1 = branch("aspp1", 1, 1)
        x2 = branch("aspp2", 3, 2)
        x3 = branch("aspp3", 3, 4)
        x4 = branch("aspp4", 3, 8)
        # global pooling branch: AdaptiveAvgPool2d(1) -> 1x1 conv -> BN -> ReLU -> nearest upsample
        g = jnp.mean(x, axis=(1, 2), keepdims=True)
        g = Conv(m, (1, 1), (1, 1), (0, 0), use_bias=False, name="aspp5")(g)
        g = BatchNorm(name="aspp5_bn")(g, train)
        g = nn.relu(g)
        g = jnp.broadcast_to(g, (x.shape[0], x.shape[1], x.shape[2], m))
        y = jnp.concatenate([x1, x2, x3, x4, g], axis=-1)
        y = Conv(self.out_channels, (1, 1), (1, 1), (0, 0), use_bias=False, name="conv2")(y)
        y = BatchNorm(name="bn2")(y, train)
        return nn.relu(y)
