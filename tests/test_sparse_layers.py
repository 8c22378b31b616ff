"""sparse_layers correctness: the phase-decomposed inverse conv must equal the
lhs-dilated transposed conv it replaces, and masked ops must match their dense
oracles."""

import numpy as np
import torch
import jax
import jax.numpy as jnp

from maggie_tpu.models.sparse_layers import (MaskedBatchNorm, SparseInverseConv,
                                             SubMConv, active_mask_downsample)


def test_sparse_inverse_conv_matches_lhs_dilated():
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(2, 9, 13, 8).astype(np.float32))
    mc = jnp.asarray((rs.rand(2, 9, 13, 1) > 0.3).astype(np.float32))
    mf = jnp.asarray((rs.rand(2, 18, 26, 1) > 0.3).astype(np.float32))

    m = SparseInverseConv(6)
    v = m.init(jax.random.PRNGKey(0), x, mc, mf)
    got = np.asarray(m.apply(v, x, mc, mf))

    k = np.asarray(v["params"]["weight"])
    ref = jax.lax.conv_general_dilated(
        x * mc, jnp.flip(jnp.asarray(k), (0, 1)), (1, 1), [(1, 2), (1, 2)],
        lhs_dilation=(2, 2), dimension_numbers=("NHWC", "HWIO", "NHWC"))
    ref = np.asarray(ref * mf)
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-4)


def test_sparse_inverse_conv_matches_torch_convtranspose():
    """Unmasked case == torch ConvTranspose2d(k=3, s=2, p=1, output_padding=1)."""
    rs = np.random.RandomState(1)
    x = rs.rand(1, 4, 8, 8).astype(np.float32)  # NCHW for torch
    tconv = torch.nn.ConvTranspose2d(4, 5, 3, stride=2, padding=1, output_padding=1, bias=False)
    with torch.no_grad():
        ref = tconv(torch.from_numpy(x)).numpy()

    m = SparseInverseConv(5)
    ones_c = jnp.ones((1, 8, 8, 1))
    ones_f = jnp.ones((1, 16, 16, 1))
    xn = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    v = m.init(jax.random.PRNGKey(0), xn, ones_c, ones_f)
    # torch ConvTranspose weight (I, O, kh, kw) -> our stored HWIO
    w = np.transpose(tconv.weight.detach().numpy(), (2, 3, 0, 1))
    got = m.apply({"params": {"weight": jnp.asarray(w)}}, xn, ones_c, ones_f)
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-4)


def test_subm_conv_inactive_inputs_do_not_contribute():
    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.rand(1, 8, 8, 4).astype(np.float32))
    m = jnp.asarray((rs.rand(1, 8, 8, 1) > 0.5).astype(np.float32))
    mod = SubMConv(4, 3)
    v = mod.init(jax.random.PRNGKey(0), x, m)
    y1 = np.asarray(mod.apply(v, x, m))
    # perturbing inactive inputs must not change the output
    x2 = x + 100.0 * (1 - m)
    y2 = np.asarray(mod.apply(v, x2, m))
    np.testing.assert_allclose(y1, y2, atol=1e-4)
    assert (y1 * (1 - np.asarray(m)) == 0).all()


def test_masked_bn_stats_over_active_only():
    rs = np.random.RandomState(3)
    x = rs.rand(2, 6, 6, 3).astype(np.float32)
    m = (rs.rand(2, 6, 6, 1) > 0.5).astype(np.float32)
    mod = MaskedBatchNorm()
    v = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(m), train=True)
    y, mut = mod.apply(v, jnp.asarray(x), jnp.asarray(m), train=True, mutable=["batch_stats"])
    active = m[..., 0] > 0
    sel = x[active]  # (n_active, 3)
    mean = sel.mean(0)
    var = sel.var(0)
    want = (sel - mean) / np.sqrt(var + 1e-5)
    np.testing.assert_allclose(np.asarray(y)[active], want, atol=1e-4, rtol=1e-3)
    # running stats: unbiased variance, momentum 0.1
    n = sel.shape[0]
    np.testing.assert_allclose(np.asarray(mut["batch_stats"]["mean"]), 0.1 * mean, atol=1e-5)
    np.testing.assert_allclose(np.asarray(mut["batch_stats"]["var"]),
                               0.9 * 1.0 + 0.1 * var * n / (n - 1), atol=1e-4)


def test_active_mask_downsample_is_window_reachability():
    m = np.zeros((1, 8, 8, 1), np.float32)
    m[0, 5, 3, 0] = 1.0
    out = np.asarray(active_mask_downsample(jnp.asarray(m)))
    # fine site (5,3) is reachable from coarse sites o with 2o+d in window, d in [-1,1]
    want = np.zeros((1, 4, 4, 1), np.float32)
    for oy in range(4):
        for ox in range(4):
            ys = range(2 * oy - 1, 2 * oy + 2)
            xs = range(2 * ox - 1, 2 * ox + 2)
            if 5 in ys and 3 in xs:
                want[0, oy, ox, 0] = 1.0
    np.testing.assert_array_equal(out, want)
