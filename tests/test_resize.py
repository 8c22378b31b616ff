"""Parity tests for maggie_tpu.ops.resize against torch.nn.functional."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from maggie_tpu.ops import resize as R


def _rand(*shape, seed=0):
    return np.random.RandomState(seed).rand(*shape).astype(np.float32)


@pytest.mark.parametrize("align_corners", [False, True])
@pytest.mark.parametrize("in_size,out_size", [((17, 23), (34, 46)), ((32, 32), (13, 9)), ((8, 8), (64, 64)), ((15, 20), (15, 20))])
def test_bilinear_matches_torch(align_corners, in_size, out_size):
    x = _rand(2, 3, *in_size)
    ref = F.interpolate(torch.from_numpy(x), size=out_size, mode="bilinear", align_corners=align_corners).numpy()
    got = np.asarray(R.resize_bilinear(jnp.asarray(x), out_size, align_corners=align_corners))
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("align_corners", [False, True])
@pytest.mark.parametrize("in_size,out_size", [((17, 23), (34, 46)), ((32, 32), (13, 9)), ((8, 8), (64, 64)), ((15, 20), (15, 20))])
def test_bilinear_np_matches_torch(align_corners, in_size, out_size):
    # host twin used by reverse_transform (no device round trip per image)
    x = _rand(2, 3, *in_size, seed=7)
    ref = F.interpolate(torch.from_numpy(x), size=out_size, mode="bilinear", align_corners=align_corners).numpy()
    got = R.resize_bilinear_np(x, out_size, align_corners=align_corners)
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("in_size,out_size", [((17, 23), (34, 46)), ((32, 32), (13, 9)), ((9, 9), (72, 72))])
def test_nearest_matches_torch(in_size, out_size):
    x = _rand(2, 3, *in_size, seed=1)
    ref = F.interpolate(torch.from_numpy(x), size=out_size, mode="nearest").numpy()
    got = np.asarray(R.resize_nearest(jnp.asarray(x), out_size))
    np.testing.assert_array_equal(got, ref)


def test_max_pool_matches_torch():
    x = _rand(2, 4, 32, 32, seed=2)
    ref = F.max_pool2d(torch.from_numpy(x), kernel_size=4, stride=4).numpy()
    got = np.asarray(R.max_pool2d(jnp.asarray(x), 4))
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_avg_pool_matches_torch():
    x = _rand(2, 4, 32, 32, seed=3)
    ref = F.avg_pool2d(torch.from_numpy(x), kernel_size=8, stride=8).numpy()
    got = np.asarray(R.avg_pool2d(jnp.asarray(x), 8))
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_resize_any_shape_rank5():
    # (b, n_f, n_i, h, w) binary-preserving downsample, ref utils.py:7-25
    x = (np.random.RandomState(4).rand(2, 3, 4, 16, 16) > 0.5).astype(np.float32)
    got = np.asarray(R.resize_any_shape(jnp.asarray(x), scale_factor=0.25, use_max_pool=True))
    ref = F.max_pool2d(torch.from_numpy(x).view(-1, 4, 16, 16), 4, 4).view(2, 3, 4, 4, 4).numpy()
    np.testing.assert_array_equal(got, ref)

    got2 = np.asarray(R.resize_any_shape(jnp.asarray(x), scale_factor=0.25, use_avg_pool_binary=True))
    ref2 = (F.avg_pool2d(torch.from_numpy(x).view(-1, 4, 16, 16), 4, 4) > 0).float().view(2, 3, 4, 4, 4).numpy()
    np.testing.assert_array_equal(got2, ref2)


def test_nhwc_bilinear_matches_nchw_path():
    x = _rand(2, 16, 12, 8, seed=5)  # NHWC
    got = np.asarray(R.resize_bilinear_nhwc(jnp.asarray(x), (32, 24), align_corners=True))
    ref = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), size=(32, 24), mode="bilinear", align_corners=True)
    np.testing.assert_allclose(got, ref.permute(0, 2, 3, 1).numpy(), atol=1e-5, rtol=1e-5)
