"""MGM decoder + Feature Aggregation Module (TCVOM; reference
``decoder/resnet_fam.py``). layers1-2 run with frozen batch statistics during
training (reference ``train()`` override, ``resnet_fam.py:12-16``)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from .decoder_dense import RefineHead
from .fam import FeatureAggregationModule
from .layers import BatchNorm, ResLayerDec, SNConvTranspose
from ..ops.resize import resize_bilinear


class ResShortCutFAMDec(nn.Module):
    layers: tuple[int, ...] = (2, 3, 3, 2)
    max_inst: int = 1
    large_kernel: bool = False
    late_downsample: bool = False

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        mid_fea,
        xb: Optional[jax.Array] = None,
        xf: Optional[jax.Array] = None,
        mask: Optional[jax.Array] = None,
        train: bool = False,
        update_sn: bool = False,
        **kwargs,
    ):
        k = 5 if self.large_kernel else 3
        midplanes = 64 if self.late_downsample else 32
        fea1, fea2, fea3, fea4, fea5 = mid_fea if isinstance(mid_fea, (list, tuple)) else mid_fea["shortcut"]

        # layers1-2 frozen in train (BN uses running stats; reference :12-16)
        x = ResLayerDec(256, self.layers[0], 2, name="layer1")(x, False, update_sn) + fea5
        x = ResLayerDec(128, self.layers[1], 2, name="layer2")(x, False, update_sn) + fea4
        features = x
        attb = attf = None
        if xb is not None:
            x, attb, attf, mask = FeatureAggregationModule(128, 1, 9, name="fam")(x, xb, xf, mask)

        x_os8 = RefineHead(32, self.max_inst, k, name="refine_OS8")(x, train)
        x = ResLayerDec(64, self.layers[2], 2, name="layer3")(x, train, update_sn) + fea3
        x_os4 = RefineHead(32, self.max_inst, k, name="refine_OS4")(x, train)
        x = ResLayerDec(midplanes, self.layers[3], 2, name="layer4")(x, train, update_sn) + fea2
        x = SNConvTranspose(32, name="conv1")(x, update_sn)
        x = BatchNorm(name="bn1")(x, train)
        x = nn.leaky_relu(x, 0.2) + fea1
        x_os1 = RefineHead(32, self.max_inst, k, name="refine_OS1")(x, train)

        h, w = x_os1.shape[1], x_os1.shape[2]
        to_maps = lambda t: jnp.transpose(t, (0, 3, 1, 2))
        ret = {
            "alpha_os1": (jnp.tanh(to_maps(x_os1)) + 1.0) / 2.0,
            "alpha_os4": (jnp.tanh(resize_bilinear(to_maps(x_os4), (h, w), align_corners=False)) + 1.0) / 2.0,
            "alpha_os8": (jnp.tanh(resize_bilinear(to_maps(x_os8), (h, w), align_corners=False)) + 1.0) / 2.0,
        }
        return ret, features, attb, attf, mask


def res_shortcut_fam_22(**kwargs) -> ResShortCutFAMDec:
    known = {f.name for f in ResShortCutFAMDec.__dataclass_fields__.values()} - {"name", "parent"}
    return ResShortCutFAMDec(layers=(2, 3, 3, 2),
                             **{k: v for k, v in kwargs.items() if k in known and k != "layers"})
