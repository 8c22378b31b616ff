"""Feature Aggregation Module (TCVOM; reference ``maggie/network/module/fam.py``).

Neighbor-frame attention: for each query position in the unknown region, attend over
a 9x9 unfolded window of the neighbor frame's key features. The reference gathers
the unknown positions with a per-sample Python loop (``fam.py:25-53``); on TPU we
compute attention at EVERY position with static shapes and zero out non-mask
positions — identical values on the mask, zeros elsewhere, no dynamic shapes.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import flax.linen as nn

from .layers import Conv
from ..ops.resize import resize_nearest


def unfold_nhwc(x: jax.Array, window: int) -> jax.Array:
    """(N, H, W, C) -> (N, H, W, window*window, C) neighborhoods (zero padded)."""
    n, h, w, c = x.shape
    patches = jax.lax.conv_general_dilated_patches(
        x, (window, window), (1, 1),
        [(window // 2, window // 2)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    # patches channels are ordered C x window x window (feature-major)
    return patches.reshape(n, h, w, c, window * window).transpose(0, 1, 2, 4, 3)


class FeatureAggregationModule(nn.Module):
    input_chn: int = 128
    reduction: int = 1
    window: int = 9

    @nn.compact
    def __call__(self, x: jax.Array, b_feat: jax.Array, f_feat: jax.Array, mask: jax.Array):
        """x/b_feat/f_feat: (B, H, W, C) NHWC; mask: (B, 1, 8H, 8W) maps.
        Returns (aggregated features, attb, attf, mask@feature-res)."""
        out_chn = self.input_chn // self.reduction
        B, H, W, _ = x.shape
        m = resize_nearest(mask, (H, W))  # (B, 1, H, W)
        m_nhw = jnp.transpose(m, (0, 2, 3, 1))  # (B, H, W, 1)

        key_conv = Conv(out_chn, (3, 3), (1, 1), (1, 1), name="key_conv")
        query_conv = Conv(out_chn, (3, 3), (1, 1), (1, 1), name="query_conv")
        value_conv = Conv(out_chn, (3, 3), (1, 1), (1, 1), name="value_conv")

        q = query_conv(x)
        v = value_conv(x)

        def attention(target):
            k = key_conv(target)
            k_unf = unfold_nhwc(k, self.window)  # (B,H,W,w2,C)
            qdotk = jnp.einsum("bhwc,bhwkc->bhwk", q, k_unf,
                               preferred_element_type=jnp.float32) / math.sqrt(out_chn)
            att_logits = qdotk * m_nhw  # zeros off-mask, like the scatter (:44-45)
            att = jax.nn.softmax(qdotk, axis=-1)
            atted = jnp.einsum("bhwk,bhwkc->bhwc", att.astype(k_unf.dtype), k_unf)
            atted = atted * m_nhw  # zeros off-mask (:51-52)
            # reference att map layout: (B, w2, H*W)
            att_maps = jnp.transpose(att_logits, (0, 3, 1, 2)).reshape(B, -1, H * W)
            return atted, att_maps

        xb, attb = attention(b_feat)
        xf, attf = attention(f_feat)
        return v + xb + xf, attb, attf, m
