"""gaussian_smoothing: composed-matmul form vs the literal op chain and a torch
replica of the reference (``maggie/utils/utils.py:61-83``)."""

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from maggie_tpu.ops.smoothing import gaussian_smoothing, _gaussian_smoothing_conv


def _torch_reference(x: np.ndarray, sigma: int) -> np.ndarray:
    """Reference chain: rank-1 g(j)^2 kernel conv with pad, over-crop, resize."""
    size = sigma * 2 + 1
    pad = size // 2
    grid = torch.arange(size, dtype=torch.float32) - size // 2
    g = torch.exp(-grid ** 2 / (2 * sigma ** 2))
    g = g / g.sum()
    k = (g * g)[None, :].expand(size, size)[None, None]
    n, c, h, w = x.shape
    t = torch.from_numpy(x).reshape(n * c, 1, h, w)
    y = F.conv2d(F.pad(t, (pad, pad, pad, pad)), k)
    y = y[:, :, pad:-pad, pad:-pad]
    y = F.interpolate(y, (h, w), mode="bilinear", align_corners=False)
    return y.reshape(n, c, h, w).numpy()


def test_matmul_form_matches_conv_form_and_torch():
    rs = np.random.RandomState(0)
    x = (rs.rand(2, 3, 96, 128) > 0.6).astype(np.float32)
    for sigma in (3, 2):
        mm = np.asarray(gaussian_smoothing(jnp.asarray(x), sigma))
        cv = np.asarray(_gaussian_smoothing_conv(jnp.asarray(x), sigma))
        ref = _torch_reference(x, sigma)
        np.testing.assert_allclose(mm, cv, atol=2e-6)
        np.testing.assert_allclose(mm, ref, atol=2e-6)


def test_degenerate_small_map_falls_back():
    x = np.ones((1, 1, 5, 5), np.float32)
    out = gaussian_smoothing(jnp.asarray(x), 3)
    assert out.shape == x.shape
