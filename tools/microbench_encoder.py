"""Locate the encoder's slowness: full encoder vs raw-conv equivalent vs folded-SN."""

import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from maggie_tpu.models.encoder import ResMaskEmbedShortCutD


def timed(fn, *args, iters=10, name=""):
    f = jax.jit(lambda c, *a: jnp.sum(fn(*a)) + c * 0.0)
    c = jnp.float32(0.0)
    float(f(c, *args))
    t0 = time.perf_counter()
    for _ in range(iters):
        c = f(c, *args)
    float(c)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:42s} {dt*1000:8.2f} ms", flush=True)
    return dt


def main():
    h, w = 576, 1024
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(1, h, w, 13).astype(np.float32))  # 3 rgb + 10 masks

    enc = ResMaskEmbedShortCutD(num_mask=10, num_embed=3)
    variables = enc.init({"params": jax.random.PRNGKey(0)}, x)

    timeit = timed

    def full(v, x):
        out, mid = enc.apply(v, x)
        return out

    timeit(full, variables, x, name="encoder (SN + BN)")

    # raw conv stack with the same shapes/channels (no SN, no BN, no shortcuts)
    def raw(x):
        rs2 = jax.random.PRNGKey(1)
        def conv(x, c, stride=1):
            k = jax.random.normal(jax.random.fold_in(rs2, c + x.shape[-1]),
                                  (3, 3, x.shape[-1], c)) * 0.05
            return jax.nn.relu(jax.lax.conv_general_dilated(
                x, k, (stride, stride), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC")))
        z = conv(x[..., :6], 32, 2)
        z = conv(z, 32)
        z = conv(z, 64, 2)
        for _ in range(3):
            z = conv(z, 64)
            z = conv(z, 64)
        z = conv(z, 128, 2)
        for _ in range(4):
            z = conv(z, 128)
            z = conv(z, 128)
        z = conv(z, 256, 2)
        for _ in range(4):
            z = conv(z, 256)
            z = conv(z, 256)
        z = conv(z, 512, 2)
        for _ in range(2):
            z = conv(z, 512)
            z = conv(z, 512)
        return z

    timeit(raw, x, name="raw conv stack (same shapes)")

    from maggie_tpu.models.encoder import ShortcutBlock
    sb = ShortcutBlock(32)
    sbv = sb.init({"params": jax.random.PRNGKey(2)}, x[..., :6])
    timeit(lambda v, z: sb.apply(v, z), sbv, x[..., :6],
           name="shortcut_0 (full-res 6->32->32)")


if __name__ == "__main__":
    main()
