"""Stage-level timing of the MaGGIe image forward on the local device.

Times encoder+ASPP, os32->os8+attention, detail branch, and fuse separately to
locate the bottleneck. Accounts for the tunneled platform's non-blocking
block_until_ready by materializing a scalar per measurement.
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from __graft_entry__ import _image_model_cfg, _make_batch
from maggie_tpu.models import build_model


def timeit(fn, *args, iters=5, name=""):
    carry = jnp.float32(0.0)
    f = jax.jit(lambda c, *a: jnp.sum(fn(*a)) + c * 0.0)
    float(f(carry, *args))  # compile+warm
    t0 = time.perf_counter()
    c = carry
    for _ in range(iters):
        c = f(c, *args)
    float(c)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:40s} {dt*1000:8.2f} ms")
    return dt


def main():
    h, w, n_i = 576, 1024, 3
    cfg = _image_model_cfg()
    model = build_model(cfg.model)
    batch = _make_batch(1, 1, n_i, h, w, seed=0)
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch, train=False)

    bound = model.bind(variables)
    x = batch["image"].reshape(1, h, w, 3)
    masks_small = batch["mask"].reshape(1, n_i, h // 8, w // 8)

    from maggie_tpu.ops.resize import resize_nearest
    masks = resize_nearest(masks_small, (h, w))
    pad = jnp.zeros((1, 10 - n_i, h, w), jnp.float32)
    inp_masks = jnp.concatenate([masks, pad], axis=1)
    inp = jnp.concatenate([x, jnp.transpose(inp_masks, (0, 2, 3, 1))], axis=-1)

    def enc_aspp(inp):
        emb, mid = bound.encoder(inp)
        return bound.aspp(emb)

    timeit(enc_aspp, inp, name="encoder + aspp")

    emb, mid_fea = bound.encoder(inp)
    emb = bound.aspp(emb)
    emb, mid_fea = jax.tree_util.tree_map(jax.device_put, (emb, mid_fea))

    dec = bound.decoder

    def os32_to_os8(emb, fea4, fea5):
        z = dec.layer1(emb) + fea5
        return dec.layer2(z) + fea4

    timeit(os32_to_os8, emb, mid_fea["shortcut"][3], mid_fea["shortcut"][4],
           name="decoder os32->os8")

    z8 = os32_to_os8(emb, mid_fea["shortcut"][3], mid_fea["shortcut"][4])
    masks5 = masks.reshape(1, 1, n_i, h, w)

    def atten(z8, masks5):
        x_os8, feat8, q, _, _ = dec.refine_OS8(z8, masks5, use_mask_atten=False)
        return x_os8

    timeit(atten, z8, masks5, name="refine_OS8 attention")

    x_os8_l, feat8, queries, _, _ = dec.refine_OS8(z8, masks5, use_mask_atten=False)
    from maggie_tpu.ops.resize import resize_bilinear
    x_os8 = (jnp.tanh(resize_bilinear(x_os8_l, (h, w), align_corners=False)) + 1) / 2
    x_os8 = x_os8[:, :n_i]

    from maggie_tpu.ops.morphology import compute_unknown

    def unknown(x_os8):
        return compute_unknown(x_os8, k_size=30, is_train=False)

    timeit(unknown, x_os8, name="compute_unknown k30")

    unk = compute_unknown(x_os8, k_size=30, is_train=False)
    q3 = queries[:, :n_i]
    fea1, fea2, fea3 = mid_fea["shortcut"][:3]

    def details(feat8, unk, q3, fea1, fea2, fea3):
        a4, a1 = dec.predict_details(feat8, unk, q3, fea1, fea2, fea3, False)
        return a1

    timeit(details, feat8, unk, q3, fea1, fea2, fea3, name="detail branch (dense oracle)")

    x_os4_l, x_os1_l = dec.predict_details(feat8, unk, q3, fea1, fea2, fea3, False)
    x_os4 = (jnp.tanh(resize_bilinear(x_os4_l, (h, w), align_corners=False)) + 1) / 2
    x_os1 = (jnp.tanh(x_os1_l) + 1) / 2

    def fuse(x_os1, x_os4, x_os8, unk):
        a, w4, w1 = dec.fuse(x_os1, x_os4, x_os8, unk, False)
        return a

    timeit(fuse, x_os1, x_os4, x_os8, unk, name="PRM fuse (2x compute_unknown)")

    def full(v, b):
        return model.apply(v, b, train=False)["refined_masks"]

    timeit(full, variables, batch, name="FULL forward")


if __name__ == "__main__":
    main()
