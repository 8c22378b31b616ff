"""gaussian_smoothing (reference ``maggie/utils/utils.py:61-83``), replicated
faithfully including its quirks: the "2D" kernel is actually g(j)^2 broadcast across
rows (the reference multiplies two identically-shaped (1,1,k) views, ``:65``), the
result is over-cropped by the pad and bilinearly resized back (``:81-82``)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .resize import resize_bilinear


@functools.lru_cache(maxsize=16)
def _kernel(sigma: int) -> np.ndarray:
    size = sigma * 2 + 1
    grid = np.arange(size, dtype=np.float32) - size // 2
    g = np.exp(-grid ** 2 / (2 * sigma ** 2))
    g = g / g.sum()
    k = np.broadcast_to((g * g)[None, :], (size, size)).copy()  # row-constant g(j)^2
    return k.astype(np.float32)


def gaussian_smoothing(x: jax.Array, sigma: int) -> jax.Array:
    """x: (N, C, H, W) map tensor; returns same shape."""
    size = sigma * 2 + 1
    pad = size // 2
    n, c, h, w = x.shape
    k = jnp.asarray(_kernel(sigma))[:, :, None, None]
    y = x.reshape(n * c, h, w, 1).astype(jnp.float32)
    y = jnp.pad(y, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    y = jax.lax.conv_general_dilated(
        y, k, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    # reference crops the pad again, then resizes back up (utils.py:81-82)
    y = y[:, pad:-pad, pad:-pad, :]
    y = y[..., 0].reshape(n, c, h - 2 * pad, w - 2 * pad)
    return resize_bilinear(y, (h, w), align_corners=False).astype(x.dtype)
