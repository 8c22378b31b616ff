"""Pallas kernel: fixed-capacity haloed patch gather for the block-sparse ladder.

The XLA form (vmapped ``dynamic_slice``; ``ops/blocksparse.py``) lowers to a
serialized gather — ~2.5 ms/frame for the os1 skip-feature gather alone at
576x1024. Here each grid step DMAs one patch window straight out of the padded
dense map with data-driven offsets (scalar-prefetched block indices), which is
exactly what the TPU DMA engines are built for: large strided copies at HBM
bandwidth, pipelined across grid steps.

Mosaic alignment: HBM slices must be tile-aligned — (8, 128) over the two minor
dims. The map is therefore flattened to (N, H, W*C) so the lane dim is W*C:
window starts are bx*block*C and sizes size_w*C, both 128-aligned whenever
C % 16 == 0 and block >= 8 (every ladder feature map; C=1 masks stay on the XLA
path — see ``supports_pallas_gather``). Rows (sublane dim) are padded to a
multiple of 8 and trimmed after.

Forward only — the ladder's backward (scatter-add of patch grads) stays on the
XLA path via ``custom_vjp`` in ``ops/blocksparse.py``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def supports_pallas_gather(n_channels: int, block: int) -> bool:
    """Alignment precondition for the DMA kernel (see module docstring):
    window starts bx*block*C must be 128-aligned for every bx."""
    return (block * n_channels) % 128 == 0


def _gather_kernel(n_ref, y_ref, x_ref, feat_ref, out_ref, sem):
    # out stays in HBM (ANY-space outputs must be whole-array blocks); each grid
    # step DMAs one patch window HBM -> HBM into its slot.
    i = pl.program_id(0)
    size_h, size_wc = out_ref.shape[1], out_ref.shape[2]
    y0 = pl.multiple_of(y_ref[i], 8)     # by*block, block >= 8
    x0 = pl.multiple_of(x_ref[i], 128)   # bx*block*C, asserted 128-aligned
    dma = pltpu.make_async_copy(
        feat_ref.at[n_ref[i], pl.ds(y0, size_h), pl.ds(x0, size_wc)],
        out_ref.at[i],
        sem,
    )
    dma.start()
    dma.wait()


@functools.partial(jax.jit, static_argnames=("block", "halo", "interpret"))
def gather_patches_pallas(feat: jax.Array, idx_n: jax.Array, idx_by: jax.Array,
                          idx_bx: jax.Array, block: int, halo: int,
                          interpret: bool = False) -> jax.Array:
    """feat (N, H, W, C) -> (cap, block + 2*halo, block + 2*halo, C).

    Same contract as ``ops.blocksparse.gather_patches``: patch p covers rows
    [by*block - halo, by*block + block + halo) of the unpadded map, zero-padded
    at the borders. Requires ``supports_pallas_gather(C, block)``.
    """
    import math

    c = feat.shape[-1]
    assert supports_pallas_gather(c, block), (c, block)
    cap = idx_n.shape[0]
    size = block + 2 * halo
    size_h = -(-size // 8) * 8           # sublane-dim window, 8-aligned
    wmult = 128 // math.gcd(c, 128)      # W units per 128-lane tile
    size_w = -(-size // wmult) * wmult   # lane-dim window, 128-aligned in W*C
    padded = jnp.pad(feat, ((0, 0), (halo, halo + (size_h - size)),
                            (halo, halo + (size_w - size)), (0, 0)))
    n_, hp, wp, _ = padded.shape
    flat = padded.reshape(n_, hp, wp * c)
    y0 = (idx_by * block).astype(jnp.int32)
    x0 = (idx_bx * (block * c)).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(cap,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA(())],
    )
    out = pl.pallas_call(
        _gather_kernel,
        out_shape=jax.ShapeDtypeStruct((cap, size_h, size_w * c), feat.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(idx_n.astype(jnp.int32), y0, x0, flat)
    return out.reshape(cap, size_h, size_w, c)[:, :size, :size]
