"""Stage-level device timing of the BENCH-condition forward (bf16, block mode).

Unlike tools/profile_forward.py (host-loop, f32 oracle), every measurement here
runs a lax.scan with a serial data dependency INSIDE one jit call, so the ~3 ms
tunnel dispatch overhead is amortized over `iters` and the numbers are device
time. Stages mirror the forward's real decomposition; a final line sums them
against the measured full forward.

Usage: python tools/profile_block.py [iters] [H W]
(H W default to the bench condition 576 1024; pass e.g. 192 256 for a quick
CPU smoke run.)
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from __graft_entry__ import _image_model_cfg, _init_variables
from bench import _blob_batch
from maggie_tpu.models import build_model
from maggie_tpu.utils.checkpoint import fold_spectral_norm

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 20


def scan_time(fn, *args, name="", iters=ITERS, reps=3):
    """Device ms/iter of fn(*args) via in-jit scan; the carry perturbs the first
    arg so XLA cannot hoist the body out of the loop."""

    def run(c0, *a):
        def body(c, _):
            out = fn(jnp.asarray(a[0]) + c * 0.0, *a[1:])
            leaves = jax.tree_util.tree_leaves(out)
            s = sum(jnp.sum(l.astype(jnp.float32)) * 1e-20 for l in leaves)
            return c + s.astype(c.dtype), ()
        c, _ = jax.lax.scan(body, c0, None, length=iters)
        return c

    f = jax.jit(run)
    float(f(jnp.float32(0.0), *args))  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(f(jnp.float32(0.0), *args))
        best = min(best, time.perf_counter() - t0)
    # calibrated dispatch: an empty jitted call measured the same way
    dt = (best - _dispatch()) / iters * 1e3
    print(f"{name:44s} {dt:8.3f} ms")
    return dt


_DISPATCH = None


def _dispatch():
    global _DISPATCH
    if _DISPATCH is None:
        e = jax.jit(lambda c: c + 1.0)
        float(e(jnp.float32(0.0)))
        _DISPATCH = min(
            (lambda t0: (float(e(jnp.float32(0.0))), time.perf_counter() - t0)[1])(
                time.perf_counter())
            for _ in range(5))
    return _DISPATCH


def main():
    h = int(sys.argv[2]) if len(sys.argv) > 3 else 576
    w = int(sys.argv[3]) if len(sys.argv) > 3 else 1024
    n_i = 3
    cfg = _image_model_cfg()
    cfg.model.precision = "bf16"
    cfg.model.decoder_args.update(dict(sparse_mode="block", block_cap_frac=0.5))
    model = build_model(cfg.model)
    batch = _blob_batch(h, w, n_i)
    variables = fold_spectral_norm(_init_variables(model, n_i=3))

    full = scan_time(
        lambda img: model.apply(variables, {"image": img, "mask": batch["mask"]},
                                train=False)["refined_masks"],
        batch["image"], name="FULL forward (block, bf16)")

    bound = model.bind(variables)
    dt = jnp.bfloat16
    x = batch["image"].reshape(1, h, w, 3)
    masks_small = batch["mask"].reshape(1, n_i, h // 8, w // 8)

    from maggie_tpu.ops.resize import resize_bilinear, resize_nearest
    masks = resize_nearest(masks_small, (h, w))
    pad = jnp.zeros((1, 10 - n_i, h, w), jnp.float32)
    inp_masks = jnp.concatenate([masks, pad], axis=1)
    inp = jnp.concatenate([x, jnp.transpose(inp_masks, (0, 2, 3, 1))],
                          axis=-1).astype(dt)

    def enc(inp):
        emb, mid = bound.encoder(inp)
        return bound.aspp(emb), mid

    t_enc = scan_time(lambda i: enc(i)[0], inp, name="encoder + aspp")

    # no jit: with the (auto-enabled) lazy os1 shortcut, mid_fea carries the
    # deferred shortcut0_fn closure, which cannot cross a jit boundary
    emb, mid_fea = enc(inp)
    dec = bound.decoder
    fea1, fea2, fea3, fea4, fea5 = mid_fea["shortcut"]
    sc0 = ((mid_fea["shortcut0_fn"], mid_fea["shortcut0_input"])
           if fea1 is None else None)

    def os32_to_os8(emb):
        z = dec.layer1(emb) + fea5
        return dec.layer2(z) + fea4

    t_up = scan_time(os32_to_os8, emb, name="decoder os32->os8")
    z8 = jax.jit(os32_to_os8)(emb)
    masks5 = masks.reshape(1, 1, n_i, h, w)

    t_att = scan_time(
        lambda z: dec.refine_OS8(z, masks5, use_mask_atten=False)[0],
        z8, name="refine_OS8 attention")

    x_os8_l, feat8, queries, _, _ = jax.jit(
        lambda z: dec.refine_OS8(z, masks5, use_mask_atten=False))(z8)
    x_os8 = (jnp.tanh(resize_bilinear(x_os8_l, (h, w), align_corners=False)) + 1) / 2
    x_os8 = x_os8[:, :n_i].astype(jnp.float32)

    from maggie_tpu.ops.morphology import compute_unknown
    t_unk = scan_time(lambda a: compute_unknown(a, k_size=30, is_train=False),
                      x_os8, name="compute_unknown k30")
    unk = jax.jit(lambda a: compute_unknown(a, k_size=30, is_train=False))(x_os8)
    q3 = queries[:, :n_i]

    t_lad = scan_time(
        lambda f8: dec.predict_details_block(f8, unk, q3, fea1, fea2, fea3,
                                             False, sc0=sc0),
        feat8, name="block ladder (predict_details_block)")

    x4l, x1l = jax.jit(
        lambda f8: dec.predict_details_block(f8, unk, q3, fea1, fea2, fea3,
                                             False, sc0=sc0))(feat8)
    x_os4 = (jnp.tanh(resize_bilinear(x4l.astype(jnp.float32), (h, w),
                                      align_corners=False)) + 1) / 2
    x_os1 = (jnp.tanh(x1l.astype(jnp.float32)) + 1) / 2

    t_fuse = scan_time(
        lambda a1: dec.fuse(a1, x_os4, x_os8, unk, False)[0],
        x_os1, name="PRM fuse (2x compute_unknown)")

    total = t_enc + t_up + t_att + t_unk + t_lad + t_fuse
    print(f"{'sum of stages':44s} {total:8.3f} ms   (full {full:.3f})")

    # ---- ladder internals ----
    from maggie_tpu.ops.blocksparse import (gather_patches, select_blocks)
    from maggie_tpu.models.sparse_layers import active_pyramid

    N = n_i
    m1 = unk.reshape(N, h, w, 1).astype(jnp.float32)
    m1_, m2, m4, m8 = jax.jit(active_pyramid)(m1)
    t_pyr = scan_time(lambda m: active_pyramid(m), m1, name="  active_pyramid")
    B1 = 64
    nb = (h // B1) * (w // B1)
    cap = max(int(round(0.5 * N * nb)), 1)
    t_sel = scan_time(lambda m: select_blocks(m[..., 0], B1 // 8, cap), m8,
                      name=f"  select_blocks cap={cap}")
    idx_n, idx_by, idx_bx, valid = jax.jit(
        lambda m: select_blocks(m[..., 0], B1 // 8, cap))(m8)
    # with the lazy shortcut, os1 skip features are computed on gathered
    # patches of the 6-channel encoder INPUT — time that gather instead,
    # mirroring the decoder's per-image indexing (decoder_sparse.py:371)
    img_n = idx_n // N
    if fea1 is not None:
        t_g1 = scan_time(lambda f: gather_patches(f, img_n, idx_by, idx_bx, 64,
                                                  3, dup_bound=N),
                         fea1.astype(dt), name="  gather fea1 os1 (64,halo3)")
    else:
        t_g1 = scan_time(lambda f: gather_patches(f, img_n, idx_by, idx_bx, 64,
                                                  5, dup_bound=N),
                         mid_fea["shortcut0_input"].astype(dt),
                         name="  gather shortcut0 input (64,halo5)")


if __name__ == "__main__":
    main()
