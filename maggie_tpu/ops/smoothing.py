"""gaussian_smoothing (reference ``maggie/utils/utils.py:61-83``), replicated
faithfully including its quirks: the "2D" kernel is actually g(j)^2 broadcast across
rows (the reference multiplies two identically-shaped (1,1,k) views, ``:65``), the
result is over-cropped by the pad and bilinearly resized back (``:81-82``).

TPU-first form: the whole chain — zero-pad, VALID conv with the rank-1 kernel,
over-crop, bilinear resize back — is linear and separable, so it composes into
ONE row matrix and ONE column matrix applied as two MXU matmuls per map
(same trick as ``ops/resize.py``). The conv's zero padding never survives the
over-crop (cropped row r of the conv output reads only original rows
[r, r + 2*pad], always in bounds), so the pad drops out of the row/col
matrices entirely. The naive conv form runs on badly-laid-out C=1 full-res
maps and costs ~10x more on v5e (tools/trace_video.py, round 3).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .resize import _linear_weight_matrix


@functools.lru_cache(maxsize=16)
def _g2(sigma: int) -> np.ndarray:
    size = sigma * 2 + 1
    grid = np.arange(size, dtype=np.float32) - size // 2
    g = np.exp(-grid ** 2 / (2 * sigma ** 2))
    g = g / g.sum()
    return (g * g).astype(np.float32)  # the reference's row-constant g(j)^2


@functools.lru_cache(maxsize=32)
def _smoothing_matrices(h: int, w: int, sigma: int) -> tuple[np.ndarray, np.ndarray]:
    """(L_rows (h,h), L_cols (w,w)) with smooth(x) == L_rows @ x @ L_cols^T."""
    size = sigma * 2 + 1
    pad = size // 2
    g2 = _g2(sigma).astype(np.float64)
    # VALID conv + crop: cropped row r = sum_i x[r + i], i in [0, size)
    cv = np.zeros((h - 2 * pad, h), dtype=np.float64)
    for i in range(size):
        cv[np.arange(h - 2 * pad), np.arange(h - 2 * pad) + i] += 1.0
    hc = np.zeros((w - 2 * pad, w), dtype=np.float64)
    for j in range(size):
        hc[np.arange(w - 2 * pad), np.arange(w - 2 * pad) + j] += g2[j]
    rr = _linear_weight_matrix(h - 2 * pad, h, False).astype(np.float64)
    rc = _linear_weight_matrix(w - 2 * pad, w, False).astype(np.float64)
    return (rr @ cv).astype(np.float32), (rc @ hc).astype(np.float32)


def gaussian_smoothing(x: jax.Array, sigma: int) -> jax.Array:
    """x: (N, C, H, W) map tensor; returns same shape."""
    size = sigma * 2 + 1
    pad = size // 2
    n, c, h, w = x.shape
    if h <= 2 * pad or w <= 2 * pad:  # degenerate maps: keep the literal chain
        return _gaussian_smoothing_conv(x, sigma)
    lr, lc = _smoothing_matrices(h, w, sigma)
    y = x.reshape(n * c, h, w).astype(jnp.float32)
    y = jnp.einsum("rh,mhw->mrw", jnp.asarray(lr), y,
                   preferred_element_type=jnp.float32)
    y = jnp.einsum("mrw,cw->mrc", y, jnp.asarray(lc),
                   preferred_element_type=jnp.float32)
    return y.reshape(n, c, h, w).astype(x.dtype)


def _gaussian_smoothing_conv(x: jax.Array, sigma: int) -> jax.Array:
    """Literal op-by-op form (pad, conv, crop, resize) — reference semantics."""
    from .resize import resize_bilinear

    size = sigma * 2 + 1
    pad = size // 2
    n, c, h, w = x.shape
    k = jnp.asarray(np.broadcast_to(_g2(sigma)[None, :], (size, size)).copy())
    k = k[:, :, None, None]
    y = x.reshape(n * c, h, w, 1).astype(jnp.float32)
    y = jnp.pad(y, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    y = jax.lax.conv_general_dilated(
        y, k, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if h <= 2 * pad or w <= 2 * pad:
        # maps too small for the reference's over-crop (it would crash on
        # these): return the SAME-padded conv result directly
        return y[..., 0].reshape(n, c, h, w).astype(x.dtype)
    # reference crops the pad again, then resizes back up (utils.py:81-82)
    y = y[:, pad:-pad, pad:-pad, :]
    y = y[..., 0].reshape(n, c, h - 2 * pad, w - 2 * pad)
    return resize_bilinear(y, (h, w), align_corners=False).astype(x.dtype)
