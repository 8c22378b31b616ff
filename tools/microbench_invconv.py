"""Compare transposed-conv strategies at detail-ladder shapes.

A k=3 s=2 transposed conv decomposes by output phase: even outputs take 1 kernel
tap per axis, odd outputs take 2 — i.e. 4 small convs + pixel interleave, instead
of an lhs-dilated conv (which TPUs often lower poorly).
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timed(fn, *args, iters=10, name=""):
    f = jax.jit(lambda c, *a: jnp.sum(fn(*a)) + c * 0.0)
    c = jnp.float32(0.0)
    float(f(c, *args))
    t0 = time.perf_counter()
    for _ in range(iters):
        c = f(c, *args)
    float(c)
    print(f"{name:44s} {(time.perf_counter()-t0)/iters*1000:8.2f} ms", flush=True)


def invconv_lhs(x, k):
    return jax.lax.conv_general_dilated(
        x, jnp.flip(k, (0, 1)), (1, 1), [(1, 2), (1, 2)], lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def invconv_phase(x, k):
    """Phase decomposition of the same op (k=3, s=2, torch p=1 op=1 geometry).

    out[2m, 2n]     = W[1,1] . x[m, n]
    out[2m+1, 2n]   = W[0,1] . x[m+1, n] + W[2,1] . x[m, n]
    out[2m, 2n+1]   = W[1,0] . x[m, n+1] + W[1,2] . x[m, n]
    out[2m+1, 2n+1] = W[0,0].x[m+1,n+1] + W[0,2].x[m+1,n] + W[2,0].x[m,n+1] + W[2,2].x[m,n]
    """
    N, H, W_, C = x.shape
    O = k.shape[-1]

    def c1(weights, shifts):
        # sum of 1x1 convs of shifted inputs
        out = None
        for (dy, dx), wslice in zip(shifts, weights):
            xs = x
            if dy:
                xs = jnp.pad(xs[:, dy:], ((0, 0), (0, dy), (0, 0), (0, 0)))
            if dx:
                xs = jnp.pad(xs[:, :, dx:], ((0, 0), (0, 0), (0, dx), (0, 0)))
            t = jnp.einsum("nhwc,co->nhwo", xs, wslice,
                           preferred_element_type=jnp.float32)
            out = t if out is None else out + t
        return out

    y_ee = c1([k[1, 1]], [(0, 0)])
    y_oe = c1([k[0, 1], k[2, 1]], [(1, 0), (0, 0)])
    y_eo = c1([k[1, 0], k[1, 2]], [(0, 1), (0, 0)])
    y_oo = c1([k[0, 0], k[0, 2], k[2, 0], k[2, 2]],
              [(1, 1), (1, 0), (0, 1), (0, 0)])
    # interleave phases: (N, H, W, 2, 2, O) -> (N, 2H, 2W, O)
    y = jnp.stack([jnp.stack([y_ee, y_eo], axis=3),
                   jnp.stack([y_oe, y_oo], axis=3)], axis=3)
    return y.reshape(N, H, 2, W_, 2, O).swapaxes(2, 3).reshape(N, 2 * H, 2 * W_, O)


def main():
    rs = np.random.RandomState(0)
    for (n, h, w, cin, cout) in [(3, 72, 128, 64, 64), (3, 144, 256, 64, 32), (3, 288, 512, 32, 32)]:
        x = jnp.asarray(rs.rand(n, h, w, cin).astype(np.float32))
        k = jnp.asarray(rs.rand(3, 3, cin, cout).astype(np.float32) * 0.05)
        a = invconv_lhs(x, k)
        b = invconv_phase(x, jnp.flip(jnp.flip(k, 0), 1) * 0 + k)  # same kernel orientation check below
        timed(invconv_lhs, x, k, name=f"lhs_dilation {h}x{w} {cin}->{cout}")
        timed(invconv_phase, x, k, name=f"phase decomp {h}x{w} {cin}->{cout}")
        # numeric equivalence (phase decomposition must match the lhs-dilated op)
        d = np.abs(np.asarray(a) - np.asarray(b)).max()
        print(f"   max diff: {d:.2e}", flush=True)


if __name__ == "__main__":
    main()


def invconv_k2(x, k):
    """Single k2 conv with 4O phase channels + depth-to-space (current impl)."""
    I, O = k.shape[2], k.shape[3]
    zeros = jnp.zeros_like(k[0, 0])

    def taps(py, ty):
        if py == 0:
            return 1 if ty == 0 else None
        return 2 if ty == 0 else 0

    k2 = []
    for ty in range(2):
        row = []
        for tx in range(2):
            phases = []
            for py in range(2):
                for px in range(2):
                    ry, rx = taps(py, ty), taps(px, tx)
                    phases.append(k[ry, rx] if ry is not None and rx is not None else zeros)
            row.append(jnp.concatenate(phases, axis=-1))
        k2.append(jnp.stack(row, axis=0))
    k2 = jnp.stack(k2, axis=0)
    y = jax.lax.conv_general_dilated(
        x, k2, (1, 1), [(0, 1), (0, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"))
    n, hc, wc, _ = y.shape
    y = y.reshape(n, hc, wc, 2, 2, O)
    return jnp.transpose(y, (0, 1, 3, 2, 4, 5)).reshape(n, 2 * hc, 2 * wc, O)


def invconv_k2_noshuffle(x, k):
    """k2 conv + strided scatter instead of transpose-reshape."""
    I, O = k.shape[2], k.shape[3]
    zeros = jnp.zeros_like(k[0, 0])

    def taps(py, ty):
        if py == 0:
            return 1 if ty == 0 else None
        return 2 if ty == 0 else 0

    k2 = []
    for ty in range(2):
        row = []
        for tx in range(2):
            phases = []
            for py in range(2):
                for px in range(2):
                    ry, rx = taps(py, ty), taps(px, tx)
                    phases.append(k[ry, rx] if ry is not None and rx is not None else zeros)
            row.append(jnp.concatenate(phases, axis=-1))
        k2.append(jnp.stack(row, axis=0))
    k2 = jnp.stack(k2, axis=0)
    y = jax.lax.conv_general_dilated(
        x, k2, (1, 1), [(0, 1), (0, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"))
    n, hc, wc, _ = y.shape
    out = jnp.zeros((n, 2 * hc, 2 * wc, O), y.dtype)
    for py in range(2):
        for px in range(2):
            blk = y[..., (py * 2 + px) * O:(py * 2 + px + 1) * O]
            out = out.at[:, py::2, px::2, :].set(blk)
    return out


def main2():
    rs = np.random.RandomState(0)
    for (n, h, w, cin, cout) in [(3, 72, 128, 64, 64), (3, 288, 512, 32, 32)]:
        x = jnp.asarray(rs.rand(n, h, w, cin).astype(np.float32))
        k = jnp.asarray(rs.rand(3, 3, cin, cout).astype(np.float32) * 0.05)
        timed(invconv_lhs, x, k, name=f"lhs_dilation {h}x{w} {cin}->{cout}")
        timed(invconv_k2, x, k, name=f"k2+transpose {h}x{w} {cin}->{cout}")
        timed(invconv_k2_noshuffle, x, k, name=f"k2+scatter   {h}x{w} {cin}->{cout}")
        d = np.abs(np.asarray(invconv_lhs(x, k)) - np.asarray(invconv_k2(x, k))).max()
        d2 = np.abs(np.asarray(invconv_lhs(x, k)) - np.asarray(invconv_k2_noshuffle(x, k))).max()
        print(f"   diffs: k2 {d:.2e}  scatter {d2:.2e}", flush=True)


main2()
