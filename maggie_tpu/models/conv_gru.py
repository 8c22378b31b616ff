"""Convolutional GRU for temporal feature memory (reference
``maggie/network/module/conv_gru.py``). NHWC tensors; time loops are Python-level
over a static, small clip length (3 eval / 8 train) so XLA unrolls them."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from .layers import Conv


class ConvGRU(nn.Module):
    channels: int
    dilation: int = 1
    kernel_size: int = 3
    padding: int = 1

    def setup(self):
        self.ih = Conv(self.channels * 2, (self.kernel_size,) * 2, (1, 1),
                       (self.padding,) * 2, (self.dilation,) * 2, name="ih_conv")
        self.hh = Conv(self.channels, (self.kernel_size,) * 2, (1, 1),
                       (self.padding,) * 2, (self.dilation,) * 2, name="hh_conv")

    def step(self, x: jax.Array, h: jax.Array) -> jax.Array:
        rz = nn.sigmoid(self.ih(jnp.concatenate([x, h], axis=-1)))
        r, z = jnp.split(rz, 2, axis=-1)
        c = jnp.tanh(self.hh(jnp.concatenate([x, r * h], axis=-1)))
        return (1 - z) * h + z * c

    def __call__(self, x: jax.Array, h: Optional[jax.Array] = None):
        """x: (b, n_f, h, w, c) time series or (b, h, w, c) single frame.
        Returns (outputs, hidden): for a series, hidden stacks every step's state
        (reference ``forward_time_series``, conv_gru.py:26-38)."""
        if x.ndim == 4:
            if h is None:
                h = jnp.zeros_like(x)
            hn = self.step(x, h)
            return hn, hn
        b, n_f = x.shape[:2]
        if h is None:
            h = jnp.zeros(x.shape[:1] + x.shape[2:], x.dtype)
        outs, hs = [], []
        for t in range(n_f):
            h = self.step(x[:, t], h)
            outs.append(h)
            hs.append(h)
        return jnp.stack(outs, axis=1), jnp.stack(hs, axis=1)

    def propagate_features(self, feat: jax.Array, n_f: int,
                           prev_h_state: Optional[jax.Array] = None,
                           temp_method: str = "none"):
        """Reference ``propagate_features`` (conv_gru.py:50-69): none / forward /
        bidirectional averaging. feat: (b, n_f, h, w, c)."""
        hidden_state = None
        if temp_method == "none":
            outs = []
            for j in range(n_f):
                o, hidden_state = self(feat[:, j], None)
                outs.append(o)
            feat = jnp.stack(outs, axis=1)
        else:
            feat_fwd, hidden_state = self(feat, prev_h_state)
            if temp_method == "bi" and n_f > 1:
                flipped = jnp.flip(feat[:, :-1], axis=1)
                feat_bwd, _ = self(flipped, hidden_state[:, -1])
                feat_bwd = jnp.flip(feat_bwd, axis=1)
                head = (feat_fwd[:, :-1] + feat_bwd) / 2
                feat = jnp.concatenate([head, feat_fwd[:, -1:]], axis=1)
            else:
                feat = feat_fwd
        return feat, hidden_state
