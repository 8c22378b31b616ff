"""Parity tests for on-device morphology vs cv2 (the reference's implementation)."""

import cv2
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from maggie_tpu.ops import morphology as M


@pytest.mark.parametrize("width", list(range(1, 30)))
def test_ellipse_kernel_matches_cv2(width):
    ref = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (width, width))
    got = M.ellipse_kernel(width)
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("width", [1, 2, 3, 7, 13, 14, 15, 29])
def test_dilate_matches_cv2(width):
    rs = np.random.RandomState(width)
    x = (rs.rand(40, 52) > 0.9).astype(np.uint8)
    ref = cv2.dilate(x, cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (width, width)))
    got = np.asarray(M.dilate_ellipse(jnp.asarray(x.astype(np.float32)), width))
    np.testing.assert_array_equal(got.astype(np.uint8), ref)


def test_compute_unknown_eval_matches_reference_semantics():
    """Eval path: threshold to (1/255, 254/255) then dilate with width k//2."""
    rs = np.random.RandomState(0)
    alpha = rs.rand(2, 3, 48, 48).astype(np.float32)
    alpha[alpha < 0.3] = 0.0
    alpha[alpha > 0.7] = 1.0
    k_size = 30
    unc = ((alpha > 1 / 255) & (alpha < 254 / 255)).astype(np.uint8)
    ref = np.stack([
        cv2.dilate(m, cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (k_size // 2, k_size // 2)))
        for m in unc.reshape(-1, 48, 48)
    ]).reshape(alpha.shape)
    got = np.asarray(M.compute_unknown(jnp.asarray(alpha), k_size=k_size, is_train=False))
    np.testing.assert_array_equal(got.astype(np.uint8), ref)


def test_compute_unknown_train_random_widths_valid():
    """Train path: random widths per map; result must contain the undilated set and be
    contained in the max-width dilation."""
    rs = np.random.RandomState(1)
    alpha = rs.rand(4, 32, 32).astype(np.float32)
    alpha[alpha < 0.4] = 0.0
    alpha[alpha > 0.6] = 1.0
    unc = ((alpha > 1 / 255) & (alpha < 254 / 255)).astype(np.float32)
    got = np.asarray(M.compute_unknown(jnp.asarray(alpha), k_size=30, is_train=True, rng=jax.random.PRNGKey(0)))
    assert np.all(got >= unc)
    upper = np.asarray(M.dilate_ellipse(jnp.asarray(unc), 29))
    assert np.all(got <= upper)


def test_compute_unknown_train_widths_vary_across_maps():
    alpha = np.full((8, 64, 64), 0.5, dtype=np.float32)
    alpha[:, :, :] = 0.0
    alpha[:, 32, 32] = 0.5  # single uncertain pixel per map
    got = np.asarray(M.compute_unknown(jnp.asarray(alpha), k_size=30, is_train=True, rng=jax.random.PRNGKey(3)))
    sizes = got.sum(axis=(1, 2))
    assert len(np.unique(sizes)) > 1, "random widths should differ across maps"
