"""Pallas kernel: fused uncertainty-region extraction (threshold + elliptical
dilation) for ``compute_unknown``.

The XLA path (``ops/morphology.py``) materializes ~10 intermediate maps in HBM
(threshold, per-run horizontal maxes, shift-maxes). This kernel keeps one alpha map
resident in VMEM per grid step and performs the whole chain on-chip:

    uncertain = (lo < a < hi)                       # VPU compare
    out       = (max over SE row-runs of vertically shifted
                 horizontal run-maxes) > 0          # VPU max tree

The structuring element uses the exact cv2 MORPH_ELLIPSE row-run decomposition
(shared with the XLA path), so outputs are bit-identical.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..morphology import LOWER_THRES, UPPER_THRES, _ellipse_row_runs


def _hshift(x, d):
    if d == 0:
        return x
    if d > 0:
        return jnp.pad(x[:, d:], ((0, 0), (0, d)))
    return jnp.pad(x[:, :d], ((0, 0), (-d, 0)))


def _vshift(x, d):
    if d == 0:
        return x
    if d > 0:
        return jnp.pad(x[d:], ((0, d), (0, 0)))
    return jnp.pad(x[:d], ((-d, 0), (0, 0)))


def _unknown_kernel(a_ref, o_ref, *, runs, lower, upper):
    a = a_ref[0]
    unc = jnp.logical_and(a > lower, a < upper).astype(jnp.float32)

    # horizontal run-maxes per distinct extent (every ellipse row-run spans col 0)
    hmax: dict = {}
    for _, a_off, b_off in runs:
        if (a_off, b_off) in hmax:
            continue
        out = None
        for d in range(a_off, b_off + 1):
            s = _hshift(unc, d)
            out = s if out is None else jnp.maximum(out, s)
        hmax[(a_off, b_off)] = out

    acc = None
    for dy, a_off, b_off in runs:
        s = _vshift(hmax[(a_off, b_off)], dy)
        acc = s if acc is None else jnp.maximum(acc, s)
    o_ref[0] = (acc > 0.0).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("k_size", "interpret"))
def compute_unknown_pallas(masks: jax.Array, k_size: int = 30,
                           interpret: bool = False) -> jax.Array:
    """Eval-mode compute_unknown (width = k_size // 2), Pallas-fused.

    masks: (..., H, W) float alpha maps; returns 0/1 maps of the same dtype.
    """
    width = k_size // 2
    lead = masks.shape[:-2]
    H, W = masks.shape[-2:]
    x = masks.reshape((-1, H, W)).astype(jnp.float32)
    runs = _ellipse_row_runs(width) if width > 1 else ((0, 0, 0),)

    kernel = functools.partial(_unknown_kernel, runs=tuple(runs),
                               lower=LOWER_THRES, upper=UPPER_THRES)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((x.shape[0], H, W), jnp.float32),
        grid=(x.shape[0],),
        in_specs=[pl.BlockSpec((1, H, W), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, H, W), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x)
    return out.reshape(lead + (H, W)).astype(masks.dtype)
