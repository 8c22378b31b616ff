"""Fixed-capacity block-sparse machinery for the detail-refinement ladder.

The reference gathers dynamic pixel lists with spconv (``torch.nonzero`` at
``resnet_inst_matt_spconv.py:206``). The TPU form keeps shapes static:

1. tile the (per-sample-per-instance) active mask into BLOCKS and score each
   block by active-pixel count;
2. ``top_k`` the scores into a FIXED-CAPACITY list of (sample, by, bx) block
   indices (overflow drops the least-active blocks — the analogue of SparseMat's
   1.6M-pixel cap, ``sparse_mat.py:67-69``);
3. gather patches WITH HALO around each selected block from dense feature maps
   (vmapped dynamic_slice = one fused gather);
4. run dense convs on the (CAP, patch, patch, C) stack — MXU-friendly;
5. scatter the exact core regions back to a dense buffer (disjoint blocks,
   OOB-dropped padding entries).

Selected blocks are identical across scales (os8/os4/os2/os1 views of the same
spatial tile), so one selection drives the whole ladder.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Patch-gather implementation: "auto" uses the Pallas DMA kernel on TPU backends
# (serialized XLA gathers cost ~2.5 ms/frame for the os1 skip features alone),
# the vmapped dynamic_slice elsewhere. "on"/"off" force a choice.
PALLAS_GATHER = "auto"


def _use_pallas_gather() -> bool:
    if PALLAS_GATHER == "on":
        return True
    if PALLAS_GATHER == "off":
        return False
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover - backend probing never fails in practice
        return False


def select_blocks(mask: jax.Array, block: int, cap: int):
    """mask: (N, H, W) 0/1. Returns (idx_n, idx_by, idx_bx, valid) each (cap,).

    Blocks are (block x block) tiles; scored by active count; top-cap selected.
    ``valid`` marks real (score > 0) entries.
    """
    n, h, w = mask.shape
    nby, nbx = h // block, w // block
    scores = mask.reshape(n, nby, block, nbx, block).sum((2, 4))  # (N, nby, nbx)
    flat = scores.reshape(-1)
    k = min(cap, flat.shape[0])
    top_scores, top_idx = jax.lax.top_k(flat, k)
    if k < cap:  # pad up to the static capacity
        top_scores = jnp.pad(top_scores, (0, cap - k))
        top_idx = jnp.pad(top_idx, (0, cap - k))
    valid = top_scores > 0
    idx_n = top_idx // (nby * nbx)
    rem = top_idx % (nby * nbx)
    idx_by = rem // nbx
    idx_bx = rem % nbx
    return idx_n, idx_by, idx_bx, valid


def _gather_patches_xla(feat: jax.Array, idx_n, idx_by, idx_bx, block: int, halo: int):
    padded = jnp.pad(feat, ((0, 0), (halo, halo), (halo, halo), (0, 0)))
    size = block + 2 * halo

    def one(n, by, bx):
        return jax.lax.dynamic_slice(
            padded, (n, by * block, bx * block, 0),
            (1, size, size, feat.shape[-1]))[0]

    return jax.vmap(one)(idx_n, idx_by, idx_bx)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def gather_patches(feat: jax.Array, idx_n, idx_by, idx_bx, block: int, halo: int,
                   dup_bound: int = 1):
    """feat: (N, H, W, C); returns (cap, block + 2*halo, block + 2*halo, C).

    Patch p covers rows [by*block - halo, by*block + block + halo); the map is
    zero-padded by halo so slices never clamp. Forward runs the Pallas DMA
    kernel on TPU backends (see ``ops/pallas/gather.py``); backward is the
    tile-grid shift decomposition (no scatters — see ``_gather_patches_bwd``).

    ``dup_bound``: max number of entries sharing one (idx_n, by, bx) tile.
    1 for per-instance gathers (select_blocks top_k indices are distinct);
    pass n_i for per-IMAGE gathers indexed with ``idx_n // n_i`` — up to n_i
    instances legitimately read the same image tile and their cotangents must
    sum.
    """
    if _use_pallas_gather():
        from .pallas.gather import gather_patches_pallas, supports_pallas_gather
        if supports_pallas_gather(feat.shape[-1], block):
            return gather_patches_pallas(feat, idx_n, idx_by, idx_bx, block, halo)
    return _gather_patches_xla(feat, idx_n, idx_by, idx_bx, block, halo)


def _gather_patches_fwd(feat, idx_n, idx_by, idx_bx, block, halo, dup_bound=1):
    out = gather_patches(feat, idx_n, idx_by, idx_bx, block, halo, dup_bound)
    dtype_token = jnp.zeros((), feat.dtype)
    return out, (feat.shape, dtype_token, idx_n, idx_by, idx_bx)


def _gather_patches_bwd(block, halo, dup_bound, res, g):
    """Exact transpose of the haloed patch gather.

    NOT the naive scatter-add (`.at[windows].add(g)`): XLA lowers that to a
    serialized per-element scatter on TPU — measured 520 ms for the os1 skip
    gather's backward ALONE in the bs4 train step (tools/trace_train.py).
    Instead: (1) route each cap entry to a unique (tile, duplicate-rank) slot
    — select_blocks top_k makes entries distinct per tile for per-instance
    gathers; per-image gathers have up to ``dup_bound`` instances per tile,
    disambiguated by a sort-derived rank; (2) one gather arranges the patch
    cotangents on the TILE GRID, summing duplicates; (3) the overlap structure
    is then 9 STATIC shifted strip adds (own core + 8 neighbor halo strips) —
    no scatter anywhere.
    """
    shape, dtype_token, idx_n, idx_by, idx_bx = res
    dtype = dtype_token.dtype
    n, h, w, c = shape
    size = block + 2 * halo
    cap = g.shape[0]
    nby, nbx = h // block, w // block
    n_tiles = n * nby * nbx

    if cap > n_tiles * dup_bound or halo >= block:
        # more duplicates than declared, or halos spanning beyond the direct
        # neighbors: exact scatter-add fallback
        ys = idx_by[:, None] * block + jnp.arange(size)[None, :]
        xs = idx_bx[:, None] * block + jnp.arange(size)[None, :]
        padded = jnp.zeros((n, h + 2 * halo, w + 2 * halo, c), g.dtype)
        padded = padded.at[idx_n[:, None, None], ys[:, :, None], xs[:, None, :], :].add(g)
        return (padded[:, halo:halo + h, halo:halo + w].astype(dtype),
                None, None, None)

    tile_lin = (idx_n * (nby * nbx) + idx_by * nbx + idx_bx).astype(jnp.int32)
    if dup_bound > 1:
        order = jnp.argsort(tile_lin)
        sk = tile_lin[order]
        rank_sorted = (jnp.arange(cap) -
                       jnp.searchsorted(sk, sk, side="left")).astype(jnp.int32)
        rank = jnp.zeros((cap,), jnp.int32).at[order].set(rank_sorted)
        key = tile_lin * dup_bound + rank                      # unique
    else:
        key = tile_lin                                         # distinct by top_k
    slot = jnp.full((n_tiles * dup_bound,), cap, jnp.int32)
    slot = slot.at[key].set(jnp.arange(cap, dtype=jnp.int32), mode="drop")
    gz = jnp.concatenate([g, jnp.zeros((1, size, size, c), g.dtype)], 0)
    gt = gz[slot].reshape(n, nby, nbx, dup_bound, size, size, c).sum(3)
    gtp = jnp.pad(gt, ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0), (0, 0)))

    acc = gt[:, :, :, halo:halo + block, halo:halo + block, :]
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if (dy, dx) == (0, 0) or halo == 0:
                continue
            # the patch at tile (ty+dy, tx+dx) overlaps tile (ty, tx) in a
            # strip with static source/destination slices
            sr = {0: (halo, block), 1: (0, halo), -1: (size - halo, halo)}[dy]
            sc = {0: (halo, block), 1: (0, halo), -1: (size - halo, halo)}[dx]
            dr = {0: (0, block), 1: (block - halo, halo), -1: (0, halo)}[dy]
            dc = {0: (0, block), 1: (block - halo, halo), -1: (0, halo)}[dx]
            strip = gtp[:, 1 + dy:1 + dy + nby, 1 + dx:1 + dx + nbx,
                        sr[0]:sr[0] + sr[1], sc[0]:sc[0] + sc[1], :]
            acc = acc.at[:, :, :, dr[0]:dr[0] + dr[1],
                         dc[0]:dc[0] + dc[1], :].add(strip)
    dfeat = (acc.transpose(0, 1, 3, 2, 4, 5).reshape(n, h, w, c)).astype(dtype)
    return (dfeat, None, None, None)


gather_patches.defvjp(_gather_patches_fwd, _gather_patches_bwd)


def _gather_mask_via_packed(mask, idx_n, idx_by, idx_bx, block: int, halo: int,
                            gather_fn):
    """C=1 windows via 4x4-pixel -> 16-channel packing (double space-to-depth).

    Pure indexing transform: pack, gather packed windows (block/4, ceil-halo),
    unpack, slice the exact (block + 2*halo) window. Exact for any gather_fn;
    requires block % 32 == 0 so the packed block*C stays 128-aligned.

    Channel bijection: each packed site's 16 channels hold one 4x4 pixel tile,
    and ANY within-tile ordering works as long as pack and unpack agree. The
    order used is c = 4*col_phase + row_phase, which lowers to a
    (..., 4, W) -> (..., W, 4) transpose of whole rows instead of the 6D
    4x4-tile shuffle (c = 4*row_phase + col_phase). Measured in the real graph
    context (producer = the Pallas ``compute_unknown`` kernel at 576x1024x3):
    the tile-shuffle order cost 0.66 ms/frame of pure layout work — the single
    largest op in the round-4 eval trace — while the row-interleave order
    composes with the producer's output layout at 0.02 ms (27x)."""
    n, h, w, _ = mask.shape
    m = (mask.reshape(n, h // 4, 4, w)
         .transpose(0, 1, 3, 2).reshape(n, h // 4, w // 4, 16))
    bp, hp = block // 4, -(-halo // 4)
    p = gather_fn(m, idx_n, idx_by, idx_bx, bp, hp)        # (cap, s, s, 16)
    cap, s = p.shape[0], p.shape[1]
    full = (p.reshape(cap, s, 4 * s, 4)
            .transpose(0, 1, 3, 2).reshape(cap, s * 4, s * 4, 1))
    off = hp * 4 - halo
    size = block + 2 * halo
    return full[:, off:off + size, off:off + size]


def gather_mask_patches(mask: jax.Array, idx_n, idx_by, idx_bx, block: int,
                        halo: int, differentiable: bool = True):
    """Haloed windows of a (N, H, W, 1) 0/1 mask.

    The generic ``gather_patches`` XLA fallback serializes per slice for C=1
    maps — measured ~50 ms/frame for the os2 mask windows alone inside the full
    graph. When the Pallas DMA kernel is available and gradients are not needed
    (eval; binary masks carry no useful cotangents anyway), the mask is packed
    4x4 pixels -> 16 channels so the kernel's lane alignment holds."""
    if (not differentiable and block % 32 == 0 and mask.shape[-1] == 1
            and _use_pallas_gather()):
        from .pallas.gather import gather_patches_pallas
        return _gather_mask_via_packed(mask, idx_n, idx_by, idx_bx, block, halo,
                                       gather_patches_pallas)
    return gather_patches(mask, idx_n, idx_by, idx_bx, block, halo)


def scatter_blocks(cores: jax.Array, idx_n, idx_by, idx_bx, valid,
                   out_shape: tuple, fill: float = 0.0):
    """cores: (cap, block, block, C) core regions -> dense (N, H, W, C) buffer
    with ``fill`` at tiles no valid block covers.

    NOT an XLA scatter: TPU scatters serialize per update (the direct form cost
    ~8.6 ms for the os1 buffer alone at 576x1024). Since selected blocks tile a
    regular disjoint grid, the scatter is re-expressed as its inverse GATHER:
    a tiny (N*nby*nbx)-entry tile->slot index is built with one small scatter,
    then every output tile gathers its core (or the fill tile) from the stack —
    two fused gathers + a transpose, at memcpy speed."""
    n, h, w, c = out_shape
    cap, block = cores.shape[0], cores.shape[1]
    nby, nbx = h // block, w // block
    tile_lin = idx_n * (nby * nbx) + idx_by * nbx + idx_bx       # (cap,)
    tile_lin = jnp.where(valid, tile_lin, n * nby * nbx)         # invalid -> spill row
    slot_of_tile = jnp.full((n * nby * nbx + 1,), cap, jnp.int32)
    slot_of_tile = slot_of_tile.at[tile_lin].set(
        jnp.arange(cap, dtype=jnp.int32), mode="drop")[:-1]      # (n*nby*nbx,)
    fill_tile = jnp.full((1, block, block, c), fill, cores.dtype)
    tiles = jnp.concatenate([cores, fill_tile], 0)[slot_of_tile]  # (tiles, blk, blk, C)
    return (tiles.reshape(n, nby, nbx, block, block, c)
            .transpose(0, 1, 3, 2, 4, 5)
            .reshape(n, h, w, c))


def scale_indices(idx_by, idx_bx, factor: int):
    """Same blocks viewed at a coarser/finer scale share indices; only the block
    size changes. Kept for clarity at call sites."""
    return idx_by, idx_bx
