"""Phase-space (space-to-depth) op re-expressions vs their dense NHWC forms."""

import numpy as np
import jax
import jax.numpy as jnp

from maggie_tpu.ops.phase import (conv1x1_phase_weights, conv3x3_phase_weights,
                                  conv_phase, d2s, invconv_phase_weights, s2d,
                                  tile_phase, expand_mask)


def _conv(x, w, pad=1):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def test_s2d_d2s_roundtrip():
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(2, 8, 12, 5).astype(np.float32))
    np.testing.assert_allclose(np.asarray(d2s(s2d(x))), np.asarray(x))


def test_conv3x3_phase_matches_dense():
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.rand(2, 16, 24, 3).astype(np.float32))
    w = jnp.asarray(rs.randn(3, 3, 3, 4).astype(np.float32)) * 0.3
    ref = _conv(x, w)
    out = d2s(conv_phase(s2d(x), conv3x3_phase_weights(w), [(1, 1), (1, 1)]))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_conv1x1_phase_matches_dense():
    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.rand(1, 10, 14, 6).astype(np.float32))
    w = jnp.asarray(rs.randn(1, 1, 6, 5).astype(np.float32)) * 0.3
    ref = _conv(x, w, pad=0)
    out = d2s(conv_phase(s2d(x), conv1x1_phase_weights(w), [(0, 0), (0, 0)]))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_invconv_phase_matches_lhs_dilated():
    rs = np.random.RandomState(3)
    x = jnp.asarray(rs.rand(2, 9, 13, 4).astype(np.float32))
    w = jnp.asarray(rs.randn(3, 3, 4, 6).astype(np.float32)) * 0.3
    # reference: the SparseInverseConv geometry (sparse_layers.py)
    ref = jax.lax.conv_general_dilated(
        x, jnp.flip(w, axis=(0, 1)), (1, 1), [(1, 2), (1, 2)],
        lhs_dilation=(2, 2), dimension_numbers=("NHWC", "HWIO", "NHWC"))
    out = d2s(conv_phase(x, invconv_phase_weights(w), [(0, 1), (0, 1)]))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_tile_and_expand():
    v = jnp.arange(3.0)
    assert tile_phase(v).shape == (12,)
    m = jnp.ones((2, 4, 4, 4))
    assert expand_mask(m, 3).shape == (2, 4, 4, 12)
