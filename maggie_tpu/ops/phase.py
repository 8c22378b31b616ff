"""Phase-space (space-to-depth) forms of the detail-ladder ops.

A stride-1 3x3 conv at os1, a 1x1 conv, and the k3/s2/p1/op1 inverse conv all
have exact re-expressions on the 2x2-space-to-depth tensor: channels become
4*C (phase-major layout: index = (a*2+b)*C + c for pixel parity (a, b)), which
packs the TPU's 128-wide lanes perfectly for the ladder's C=32 feature maps —
the NHWC forms waste 4x physical memory on lane padding and under-fill the MXU
contraction. Weight assemblies here are exact rearrangements of the original
kernels (structural zeros where a tap falls outside the support), verified
against the dense ops in tests/test_phase.py.

Used by the eval-path phase rung of the block-sparse decoder
(``models/decoder_sparse.py``); reference semantics unchanged
(``resnet_inst_matt_spconv.py:196-270``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def s2d(x: jax.Array) -> jax.Array:
    """(N, H, W, C) -> (N, H/2, W/2, 4C), phase-major."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h // 2, w // 2, 4 * c)


def d2s(x: jax.Array) -> jax.Array:
    """(N, h, w, 4C) -> (N, 2h, 2w, C), inverse of :func:`s2d`."""
    n, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(n, h, w, 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, 2 * h, 2 * w, c)


def tile_phase(v: jax.Array) -> jax.Array:
    """Per-channel param (C,) -> phase-major (4C,)."""
    return jnp.tile(v, 4)


def expand_mask(m_ph: jax.Array, c: int) -> jax.Array:
    """Phase mask (..., 4) -> per-phase-channel (..., 4C)."""
    return jnp.repeat(m_ph, c, axis=-1)


def conv3x3_phase_weights(w: jax.Array) -> jax.Array:
    """(3, 3, Ci, Co) os1 conv -> (3, 3, 4Ci, 4Co) phase-space conv (pad 1).

    Output phase (a, b) at block (i, j) is os1 site (2i+a, 2j+b); its tap at
    os1 offset (dy, dx) lives in input phase ((a+dy)%2, (b+dx)%2) at block
    offset floor((a+dy)/2).
    """
    ci, co = w.shape[2], w.shape[3]
    wp = jnp.zeros((3, 3, 4 * ci, 4 * co), w.dtype)
    for a in range(2):
        for b in range(2):
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    ap, u = (a + dy) % 2, (a + dy) // 2
                    bp, v = (b + dx) % 2, (b + dx) // 2
                    wp = wp.at[u + 1, v + 1,
                               (ap * 2 + bp) * ci:(ap * 2 + bp + 1) * ci,
                               (a * 2 + b) * co:(a * 2 + b + 1) * co].set(
                                   w[dy + 1, dx + 1])
    return wp


def conv1x1_phase_weights(w: jax.Array) -> jax.Array:
    """(1, 1, Ci, Co) -> (1, 1, 4Ci, 4Co) phase-blockdiagonal."""
    ci, co = w.shape[2], w.shape[3]
    wp = jnp.zeros((1, 1, 4 * ci, 4 * co), w.dtype)
    for p in range(4):
        wp = wp.at[0, 0, p * ci:(p + 1) * ci, p * co:(p + 1) * co].set(w[0, 0])
    return wp


def invconv_phase_weights(w: jax.Array) -> jax.Array:
    """k3/s2/p1/op1 inverse-conv kernel (3, 3, Ci, Co) -> (2, 2, Ci, 4Co).

    From the lhs-dilated form y = conv(dilate2(x), flip(w), pad (1, 2)):
    even outputs y[2i] = x[i] @ fw[1]; odd y[2i+1] = x[i] @ fw[0] + x[i+1] @ fw[2]
    (fw = flipped kernel). Apply with padding ((0, 1), (0, 1)) so conv tap k
    reads x[i+k].
    """
    ci, co = w.shape[2], w.shape[3]
    fw = jnp.flip(w, axis=(0, 1))
    # k(a, u): even phase uses u=0 tap fw[1]; odd phase u=0 -> fw[0], u=1 -> fw[2]
    taps = {(0, 0): 1, (1, 0): 0, (1, 1): 2}
    wp = jnp.zeros((2, 2, ci, 4 * co), w.dtype)
    for a in range(2):
        for b in range(2):
            for u in range(2):
                for v in range(2):
                    if (a, u) in taps and (b, v) in taps:
                        wp = wp.at[u, v, :,
                                   (a * 2 + b) * co:(a * 2 + b + 1) * co].set(
                                       fw[taps[(a, u)], taps[(b, v)]])
    return wp


def conv_phase(x: jax.Array, wp: jax.Array, padding) -> jax.Array:
    """NHWC conv with a phase-space kernel."""
    return jax.lax.conv_general_dilated(
        x, wp.astype(x.dtype), (1, 1), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
