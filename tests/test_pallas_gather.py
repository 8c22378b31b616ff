"""Pallas patch-gather vs the XLA reference + custom-vjp backward."""

import numpy as np
import jax
import jax.numpy as jnp

from maggie_tpu.ops.blocksparse import (_gather_patches_xla, gather_patches,
                                        select_blocks)
from maggie_tpu.ops.pallas.gather import gather_patches_pallas


def _setup(seed=0):
    rs = np.random.RandomState(seed)
    feat = jnp.asarray(rs.rand(3, 64, 96, 16).astype(np.float32))  # 8*16 = 128-aligned
    mask = (rs.rand(3, 8, 12) > 0.6).astype(np.float32)  # block grid 8x12 of 8px
    idx_n, idx_by, idx_bx, valid = select_blocks(jnp.asarray(mask), 1, cap=20)
    return feat, idx_n, idx_by, idx_bx


def test_pallas_gather_matches_xla():
    feat, idx_n, idx_by, idx_bx = _setup()
    ref = _gather_patches_xla(feat, idx_n, idx_by, idx_bx, 8, 3)
    out = gather_patches_pallas(feat, idx_n, idx_by, idx_bx, 8, 3, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref))


def test_gather_patches_backward_matches_autodiff():
    feat, idx_n, idx_by, idx_bx = _setup(1)

    def f_custom(x):
        return jnp.sum(gather_patches(x, idx_n, idx_by, idx_bx, 8, 2) ** 2)

    def f_plain(x):
        return jnp.sum(_gather_patches_xla(x, idx_n, idx_by, idx_bx, 8, 2) ** 2)

    g_custom = jax.grad(f_custom)(feat)
    g_plain = jax.grad(f_plain)(feat)
    np.testing.assert_allclose(np.asarray(g_custom), np.asarray(g_plain),
                               rtol=1e-6, atol=1e-6)


def test_packed_mask_gather_indexing_exact():
    """The 4x4->16ch packing transform must be an exact identity around any
    gather implementation (here the XLA one)."""
    from maggie_tpu.ops.blocksparse import _gather_mask_via_packed
    rs = np.random.RandomState(3)
    mask = jnp.asarray((rs.rand(3, 128, 192, 1) > 0.5).astype(np.float32))
    idx_n = jnp.asarray(rs.randint(0, 3, 15))
    idx_by = jnp.asarray(rs.randint(0, 128 // 32, 15))
    idx_bx = jnp.asarray(rs.randint(0, 192 // 32, 15))
    for block, halo in ((32, 2), (64, 4), (32, 5)):
        if block > 128 // 2:
            continue
        ref = _gather_patches_xla(mask, idx_n, idx_by, idx_bx, block, halo)
        out = _gather_mask_via_packed(mask, idx_n, idx_by, idx_bx, block, halo,
                                      _gather_patches_xla)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   err_msg=f"block={block} halo={halo}")


def test_gather_patches_backward_is_exact_transpose():
    """The 9-shift tile-decomposed backward (ops/blocksparse.py
    ``_gather_patches_bwd``) must equal the naive scatter-add adjoint — the
    scatter form serialized on TPU (520 ms for one gather's backward in the
    bs4 train step), the shift form is pure regular gathers."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from maggie_tpu.ops.blocksparse import gather_patches, select_blocks

    rs = np.random.RandomState(0)
    for (n, h, w, c, blk, halo, frac) in [
            (3, 128, 192, 8, 32, 4, 0.5),   # partial capacity
            (2, 64, 64, 5, 16, 6, 1.0),     # full capacity, big halo
            (1, 64, 128, 3, 32, 0, 0.7)]:   # halo 0 (f2p train geometry)
        feat = jnp.asarray(rs.rand(n, h, w, c).astype(np.float32))
        mask = jnp.asarray((rs.rand(n, h, w) > 0.7).astype(np.float32))
        cap = max(int(frac * n * (h // blk) * (w // blk)), 1)
        idx_n, idx_by, idx_bx, _ = select_blocks(mask, blk, cap)
        size = blk + 2 * halo
        g = jnp.asarray(rs.rand(cap, size, size, c).astype(np.float32))
        _, vjp = jax.vjp(
            lambda x: gather_patches(x, idx_n, idx_by, idx_bx, blk, halo), feat)
        got = np.asarray(vjp(g)[0])

        ref = np.zeros((n, h + 2 * halo, w + 2 * halo, c), np.float32)
        gn, ys, xs = np.asarray(g), np.asarray(idx_by) * blk, np.asarray(idx_bx) * blk
        for p in range(cap):
            ref[np.asarray(idx_n)[p], ys[p]:ys[p] + size, xs[p]:xs[p] + size] += gn[p]
        np.testing.assert_allclose(got, ref[:, halo:halo + h, halo:halo + w],
                                   atol=1e-5)


def test_gather_patches_backward_with_duplicate_image_tiles():
    """Per-image gathers (idx // n_i) have up to n_i entries per tile; the
    dedup-rank path must sum their cotangents exactly like the scatter-add."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from maggie_tpu.ops.blocksparse import gather_patches

    rs = np.random.RandomState(1)
    n_img, n_i, h, w, c, blk, halo = 2, 3, 128, 128, 8, 32, 4
    feat = jnp.asarray(rs.rand(n_img, h, w, c).astype(np.float32))
    cap = 20
    # instance-style indices with heavy overlap, then mapped per-image
    img_n = jnp.asarray(rs.randint(0, n_img, cap).astype(np.int32))
    idx_by = jnp.asarray(rs.randint(0, h // blk, cap).astype(np.int32))
    idx_bx = jnp.asarray(rs.randint(0, w // blk, cap).astype(np.int32))
    size = blk + 2 * halo
    g = jnp.asarray(rs.rand(cap, size, size, c).astype(np.float32))
    _, vjp = jax.vjp(lambda x: gather_patches(x, img_n, idx_by, idx_bx, blk,
                                              halo, dup_bound=cap), feat)
    got = np.asarray(vjp(g)[0])

    ref = np.zeros((n_img, h + 2 * halo, w + 2 * halo, c), np.float32)
    gn = np.asarray(g)
    for p in range(cap):
        y0, x0 = int(idx_by[p]) * blk, int(idx_bx[p]) * blk
        ref[int(img_n[p]), y0:y0 + size, x0:x0 + size] += gn[p]
    np.testing.assert_allclose(got, ref[:, halo:halo + h, halo:halo + w],
                               atol=1e-5)
