"""Pallas kernel: fused uncertainty-region extraction (threshold + elliptical
dilation) for ``compute_unknown``.

The XLA path (``ops/morphology.py``) materializes ~10 intermediate maps in HBM
(threshold, per-run horizontal maxes, shift-maxes) — and, embedded in a large
eval graph, inherits whatever layout the producing convs used, which on v5e
runs those passes at a fraction of line rate. This kernel DMAs a row-chunk of
one alpha map (plus a ``width//2`` halo) into VMEM per grid step and performs
the whole chain on-chip:

    uncertain = (lo < a < hi)                       # VPU compare
    out       = (max over SE row-runs of vertically shifted
                 horizontal run-maxes) > 0          # VPU max tree

The structuring element uses the exact cv2 MORPH_ELLIPSE row-run decomposition
(shared with the XLA path), so outputs are bit-identical to the XLA path and
to cv2. Row-chunking bounds VMEM (~4 chunk-sized buffers) at any resolution;
the halo rows come from a manual async copy out of the padded HBM-resident
input, since blocked in-specs cannot express overlapping windows.
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


def _unknown_kernel(x_ref, o_ref, scratch, sem, *, runs, lower, upper, halo,
                    chunk, rows):
    i, j = pl.program_id(0), pl.program_id(1)
    y0 = pl.multiple_of(j * chunk, 8)  # chunk is 8-aligned
    dma = pltpu.make_async_copy(x_ref.at[i, pl.ds(y0, rows), :], scratch, sem)
    dma.start()
    dma.wait()

    a = scratch[...]
    unc = jnp.logical_and(a > lower, a < upper).astype(jnp.float32)

    # group row-runs by horizontal extent; fold each extent's vertical shifts
    # into the accumulator immediately — live buffers: unc, h, acc
    by_extent: dict = {}
    for dy, a_off, b_off in runs:
        by_extent.setdefault((a_off, b_off), []).append(dy)

    acc = None
    for (a_off, b_off), dys in by_extent.items():
        h = None
        for d in range(a_off, b_off + 1):
            s = _hshift(unc, d)
            h = s if h is None else jnp.maximum(h, s)
        for dy in dys:
            s = _vshift(h, dy)
            acc = s if acc is None else jnp.maximum(acc, s)
    o_ref[0] = (acc[halo:halo + chunk] > 0.0).astype(o_ref.dtype)


def _row_chunk(H: int, W: int, halo: int, budget_bytes: int = 2 << 20) -> int:
    """Largest 8-aligned row chunk whose ~4 live f32 buffers fit the budget."""
    rows = max(budget_bytes // (4 * W * 4) - 2 * halo, 8)
    rows = min(-(-H // 8) * 8, rows)
    return int(rows - rows % 8) or 8


@functools.partial(jax.custom_jvp, nondiff_argnums=(1, 2))
@functools.partial(jax.jit, static_argnames=("k_size", "interpret"))
def compute_unknown_pallas(masks: jax.Array, k_size: int = 30,
                           interpret: bool = False) -> jax.Array:
    """Eval-mode compute_unknown (width = k_size // 2), Pallas-fused.

    masks: (..., H, W) float alpha maps; returns 0/1 maps of the same dtype.
    Differentiable with zero tangent: the op is piecewise constant (thresholds
    + max over a 0/1 map), so its derivative is 0 almost everywhere — matching
    what autodiff yields through the XLA chain's comparisons.
    """
    width = k_size // 2
    lead = masks.shape[:-2]
    H, W = masks.shape[-2:]
    x = masks.reshape((-1, H, W)).astype(jnp.float32)
    runs = _ellipse_row_runs(width) if width > 1 else ((0, 0, 0),)
    halo = max((abs(r[0]) for r in runs), default=0)

    # Mosaic DMA slices must be 128-aligned along lanes: pad W up. The pad
    # columns are zeros — outside (lo, hi), so never "uncertain", and the
    # horizontal shifts read them exactly where the unpadded op would read
    # its own zero padding — then get sliced off.
    Wp = -(-W // 128) * 128
    chunk = _row_chunk(H, Wp, halo)
    n_chunks = -(-H // chunk)
    rows = chunk + 2 * halo
    rows = -(-rows // 8) * 8  # DMA window, sublane-aligned
    # pad rows so every DMA window [j*chunk, j*chunk + rows) is in bounds;
    # padded rows are zeros, which never win a max over a 0/1 map
    x = jnp.pad(x, ((0, 0), (halo, (n_chunks - 1) * chunk + rows - halo - H),
                    (0, Wp - W)))

    kernel = functools.partial(_unknown_kernel, runs=tuple(runs),
                               lower=LOWER_THRES, upper=UPPER_THRES,
                               halo=halo, chunk=chunk, rows=rows)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((x.shape[0], n_chunks * chunk, Wp),
                                       jnp.float32),
        grid=(x.shape[0], n_chunks),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((1, chunk, Wp), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((rows, Wp), jnp.float32),
                        pltpu.SemaphoreType.DMA],
        interpret=interpret,
    )(x)
    return out[:, :H, :W].reshape(lead + (H, W)).astype(masks.dtype)


@compute_unknown_pallas.defjvp
def _compute_unknown_pallas_jvp(k_size, interpret, primals, tangents):
    (masks,) = primals
    out = compute_unknown_pallas(masks, k_size, interpret)
    return out, jnp.zeros_like(out)
