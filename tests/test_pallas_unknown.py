"""Pallas compute_unknown kernel (interpret mode on CPU) vs the XLA path and cv2."""

import cv2
import numpy as np
import jax.numpy as jnp

from maggie_tpu.ops.morphology import compute_unknown
from maggie_tpu.ops.pallas import compute_unknown_pallas


def test_pallas_matches_xla_and_cv2():
    rs = np.random.RandomState(0)
    alpha = rs.rand(3, 2, 64, 96).astype(np.float32)
    alpha[alpha < 0.3] = 0.0
    alpha[alpha > 0.7] = 1.0
    for k_size in (30, 27, 15):
        xla = np.asarray(compute_unknown(jnp.asarray(alpha), k_size=k_size, is_train=False))
        pal = np.asarray(compute_unknown_pallas(jnp.asarray(alpha), k_size=k_size, interpret=True))
        np.testing.assert_array_equal(pal, xla)
        width = k_size // 2
        unc = ((alpha > 1 / 255) & (alpha < 254 / 255)).astype(np.uint8)
        ref = np.stack([cv2.dilate(m, cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (width, width)))
                        for m in unc.reshape(-1, 64, 96)]).reshape(alpha.shape)
        np.testing.assert_array_equal(pal.astype(np.uint8), ref)


def test_pallas_multi_chunk_boundaries(monkeypatch):
    """The row-chunked halo-DMA path with n_chunks > 1 — the regime the real
    576p/1024p eval shapes run in (chunk ~112, 6 chunks) while the other tests
    fit a single chunk. Shrinking the VMEM budget forces 8-row chunks on a
    small map, covering the inter-chunk halo offsets and the 8-aligned window
    arithmetic; a 0.5-blob alpha puts uncertainty bands across every chunk
    boundary."""
    import maggie_tpu.ops.pallas.unknown as pu

    orig = pu._row_chunk
    monkeypatch.setattr(
        pu, "_row_chunk",
        lambda H, W, halo, budget_bytes=2 << 20: orig(H, W, halo, budget_bytes=1))

    rs = np.random.RandomState(2)
    # distinct shape so the shrunken chunking is traced fresh (jit cache)
    alpha = rs.rand(2, 72, 136).astype(np.float32)
    alpha[alpha < 0.3] = 0.0
    alpha[alpha > 0.7] = 1.0
    for k_size in (30, 15):
        width = k_size // 2
        chunk = pu._row_chunk(72, 256, width // 2)
        assert -(-72 // chunk) > 1  # really multi-chunk
        xla = np.asarray(compute_unknown(jnp.asarray(alpha), k_size=k_size,
                                         is_train=False))
        pal = np.asarray(compute_unknown_pallas(jnp.asarray(alpha),
                                                k_size=k_size, interpret=True))
        np.testing.assert_array_equal(pal, xla)
        unc = ((alpha > 1 / 255) & (alpha < 254 / 255)).astype(np.uint8)
        ref = np.stack([cv2.dilate(
            m, cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (width, width)))
            for m in unc])
        np.testing.assert_array_equal(pal.astype(np.uint8), ref)


def test_pallas_unknown_zero_gradient():
    """The custom_jvp makes the op differentiable with zero tangent (the op is
    piecewise constant), so train graphs that hit the Pallas path backprop."""
    import jax

    rs = np.random.RandomState(1)
    alpha = jnp.asarray(rs.rand(1, 1, 32, 32).astype(np.float32))
    g = jax.grad(lambda a: compute_unknown_pallas(a, k_size=15, interpret=True).sum())(alpha)
    np.testing.assert_array_equal(np.asarray(g), 0.0)
