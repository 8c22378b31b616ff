"""Dense decoders: the MGM baseline decoder (reference ``decoder/resnet.py``,
``res_shortcut_22``) producing os1/os4/os8 alphas via upsampling BasicBlocks with
skip adds and three conv heads."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from .layers import BatchNorm, Conv, ResLayerDec, SNConvTranspose
from ..ops.resize import resize_bilinear


class RefineHead(nn.Module):
    """conv(k) -> BN -> LeakyReLU -> conv(k) head (reference ``resnet.py:74-91``)."""

    mid: int = 32
    out: int = 1
    kernel: int = 3

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        k = self.kernel
        y = Conv(self.mid, (k, k), (1, 1), (k // 2, k // 2), use_bias=False, name="conv1")(x)
        y = BatchNorm(name="bn")(y, train)
        y = nn.leaky_relu(y, 0.2)
        return Conv(self.out, (k, k), (1, 1), (k // 2, k // 2), name="conv2")(y)


class ResShortCutDec(nn.Module):
    """MGM decoder (reference ``ResShortCut_D_Dec``, ``decoder/resnet.py:163-199``)."""

    layers: tuple[int, ...] = (2, 3, 3, 2)
    max_inst: int = 1
    large_kernel: bool = False
    late_downsample: bool = False

    @nn.compact
    def __call__(
        self,
        x: jax.Array,          # (b*n_f, h32, w32, 512)
        mid_fea: dict,
        b: int,
        n_f: int,
        n_i: int,
        masks: Optional[jax.Array] = None,
        gt_alphas: Optional[jax.Array] = None,
        train: bool = False,
        update_sn: bool = False,
        return_ctx: bool = False,
        **kwargs,
    ) -> dict:
        k = 5 if self.large_kernel else 3
        midplanes = 64 if self.late_downsample else 32
        fea1, fea2, fea3, fea4, fea5 = mid_fea["shortcut"]

        ret = {}
        x = ResLayerDec(256, self.layers[0], 2, name="layer1")(x, train, update_sn) + fea5
        x = ResLayerDec(128, self.layers[1], 2, name="layer2")(x, train, update_sn) + fea4
        if return_ctx:
            ret["ctx"] = x
        x_os8 = RefineHead(32, self.max_inst, k, name="refine_OS8")(x, train)

        x = ResLayerDec(64, self.layers[2], 2, name="layer3")(x, train, update_sn) + fea3
        x_os4 = RefineHead(32, self.max_inst, k, name="refine_OS4")(x, train)

        x = ResLayerDec(midplanes, self.layers[3], 2, name="layer4")(x, train, update_sn) + fea2
        x = SNConvTranspose(32, name="conv1")(x, update_sn)
        x = BatchNorm(name="bn1")(x, train)
        x = nn.leaky_relu(x, 0.2) + fea1
        x_os1 = RefineHead(32, self.max_inst, k, name="refine_OS1")(x, train)

        h, w = x_os1.shape[1], x_os1.shape[2]
        # heads are NHWC; alpha maps downstream are (N, n_i, H, W) and always f32
        def to_maps(t):
            return jnp.transpose(t, (0, 3, 1, 2)).astype(jnp.float32)

        x_os8 = resize_bilinear(to_maps(x_os8), (h, w), align_corners=False)
        x_os4 = resize_bilinear(to_maps(x_os4), (h, w), align_corners=False)
        x_os1 = to_maps(x_os1)

        ret["alpha_os1"] = (jnp.tanh(x_os1) + 1.0) / 2.0
        ret["alpha_os4"] = (jnp.tanh(x_os4) + 1.0) / 2.0
        ret["alpha_os8"] = (jnp.tanh(x_os8) + 1.0) / 2.0
        return ret


def res_shortcut_22(**kwargs) -> ResShortCutDec:
    known = {f.name for f in ResShortCutDec.__dataclass_fields__.values()}
    return ResShortCutDec(layers=(2, 3, 3, 2),
                          **{k: v for k, v in kwargs.items() if k in known and k != "layers"})
