"""Matting losses (reference ``maggie/network/loss.py`` and
``arch/maggie.py:237-266``), numerically parity-matched to torch.

- ``regression_loss``: weighted L1/L2 with the reference's sum/(w.sum()+1e-8)
  normalization (``maggie.py:237-266``);
- ``LapLoss``: 3-level Laplacian pyramid with the binomial 5x5 kernel, reflect pad,
  zero-interleave upsample and a subsampled weight pyramid (``loss.py:120-191``);
- ``GradientLoss``: L1 on normalized-Sobel magnitudes with replicate pad
  (``loss.py:67-118``);
- ``loss_dtSSD``: temporal-derivative L2; note the reference's denominator adds 1e-6
  PER ELEMENT (``torch.sum(mask + 1e-6)``, ``loss.py:7-16``) — replicated exactly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def regression_loss(logit: jax.Array, target: jax.Array, loss_type: str = "l1",
                    weight: jax.Array | None = None) -> jax.Array:
    if weight is None:
        if loss_type == "l1":
            return jnp.mean(jnp.abs(logit - target))
        if loss_type == "l2":
            return jnp.mean(jnp.square(logit - target))
        raise NotImplementedError(loss_type)
    if loss_type == "l1":
        loss = jnp.abs(logit * weight - target * weight)
        return jnp.sum(loss) / (jnp.sum(weight) + 1e-8)
    if loss_type == "l2":
        loss = jnp.square(logit * weight - target * weight)
        return jnp.sum(loss) / (jnp.sum(weight) + 1e-8)
    raise NotImplementedError(loss_type)


def loss_dtssd(pred: jax.Array, gt: jax.Array, mask: jax.Array) -> jax.Array:
    """pred/gt/mask: (b, n_f, n_i, h, w). Reference ``_loss_dtSSD`` (loss.py:7-16)."""
    dadt = pred[:, 1:] - pred[:, :-1]
    dgdt = gt[:, 1:] - gt[:, :-1]
    diff = jnp.square(dadt - dgdt) * mask[:, 1:]
    # torch: sum(mask + 1e-6) adds the epsilon once per element
    denom = jnp.sum(mask[:, 1:]) + 1e-6 * np.prod(mask[:, 1:].shape)
    return jnp.sum(diff) / denom


# ---------------- Sobel gradient loss ----------------

def _sobel_kernels() -> tuple[np.ndarray, np.ndarray]:
    kx = np.array([[-1.0, 0.0, 1.0], [-2.0, 0.0, 2.0], [-1.0, 0.0, 1.0]], np.float32)
    kx = kx / np.abs(kx).sum()
    ky = kx.T
    return kx, ky


def _replicate_pad(x: jax.Array, pad: int) -> jax.Array:
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="edge")


def sobel_magnitude(x: jax.Array, eps: float = 1e-6) -> jax.Array:
    """x: (..., h, w) treated per-map. Returns |grad| with replicate padding."""
    lead = x.shape[:-2]
    h, w = x.shape[-2:]
    y = x.reshape((-1, h, w, 1)).astype(jnp.float32)
    y = _replicate_pad(y, 1)
    kx, ky = _sobel_kernels()
    k = jnp.asarray(np.stack([kx, ky], axis=-1)[:, :, None, :])  # (3,3,1,2)
    g = jax.lax.conv_general_dilated(
        y, k, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    mag = jnp.sqrt(jnp.square(g[..., 0]) + jnp.square(g[..., 1]) + eps)
    return mag.reshape(lead + (h, w))


def gradient_loss(logit: jax.Array, label: jax.Array, mask: jax.Array | None = None,
                  eps: float = 1e-6) -> jax.Array:
    """Reference ``GradientLoss.forward`` (loss.py:73-88)."""
    if mask is not None:
        logit = logit * mask
        label = label * mask
        diff = jnp.abs(sobel_magnitude(logit) - sobel_magnitude(label))
        return jnp.sum(diff) / (jnp.sum(mask) + eps)
    return jnp.mean(jnp.abs(sobel_magnitude(logit) - sobel_magnitude(label)))


# ---------------- Laplacian pyramid loss ----------------

@functools.lru_cache(maxsize=4)
def _gauss_kernel() -> np.ndarray:
    k = np.array([[1., 4., 6., 4., 1.],
                  [4., 16., 24., 16., 4.],
                  [6., 24., 36., 24., 6.],
                  [4., 16., 24., 16., 4.],
                  [1., 4., 6., 4., 1.]], np.float32) / 256.0
    return k


def _conv_gauss(x: jax.Array, scale: float = 1.0) -> jax.Array:
    """Depthwise 5x5 gaussian with reflect pad 2 (loss.py:143-146). x: (n, h, w, c)."""
    k = jnp.asarray(_gauss_kernel() * scale)[:, :, None, None]
    c = x.shape[-1]
    k = jnp.tile(k, (1, 1, 1, c))  # depthwise via feature groups
    y = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)), mode="reflect")
    return jax.lax.conv_general_dilated(
        y, k, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c)


def _downsample(x: jax.Array) -> jax.Array:
    return x[:, ::2, ::2, :]


def _upsample(x: jax.Array) -> jax.Array:
    """Zero-interleave 2x then smooth with 4*gauss (loss.py:134-141)."""
    n, h, w, c = x.shape
    z = jnp.zeros_like(x)
    col = jnp.stack([x, z], axis=3).reshape(n, h, 2 * w, c)  # interleave along w
    z2 = jnp.zeros_like(col)
    up = jnp.stack([col, z2], axis=2).reshape(n, 2 * h, 2 * w, c)  # along h
    return _conv_gauss(up, scale=4.0)


def laplacian_pyramid(x: jax.Array, max_levels: int = 3) -> list[jax.Array]:
    pyr = []
    cur = x
    for _ in range(max_levels):
        filtered = _conv_gauss(cur)
        down = _downsample(filtered)
        up = _upsample(down)
        pyr.append(cur - up)
        cur = down
    return pyr


def lap_loss(inp: jax.Array, target: jax.Array, weight: jax.Array | None = None,
             max_levels: int = 3) -> jax.Array:
    """inp/target/weight: (n, 1, h, w) reference layout; internally NHWC."""
    def to_nhwc(t):
        return jnp.transpose(t, (0, 2, 3, 1)).astype(jnp.float32)

    pi = laplacian_pyramid(to_nhwc(inp), max_levels)
    pt = laplacian_pyramid(to_nhwc(target), max_levels)
    if weight is not None:
        ws = []
        cur = to_nhwc(weight)
        for _ in range(max_levels):
            ws.append(cur)
            cur = _downsample(cur)
    else:
        ws = [None] * max_levels
    total = 0.0
    for a, b, w in zip(pi, pt, ws):
        if w is None:
            total += jnp.mean(jnp.abs(a - b))
        else:
            total += jnp.sum(jnp.abs(a - b) * w) / (jnp.sum(w) + 1e-6)
    return total
