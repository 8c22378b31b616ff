"""On-device morphology: elliptical dilation and uncertainty-region extraction.

The reference computes the "unknown"/uncertainty region with a device->host
round trip on every forward pass (``maggie/utils/utils.py:28-55``: ``.cpu().numpy()``,
per-map ``cv2.dilate`` with an elliptical structuring element, copy back). Here the
whole thing stays on the TPU: the cv2 ``MORPH_ELLIPSE`` structuring element is
reproduced bit-exactly (including cv2's banker's rounding and even-width anchor
asymmetry) and dilation of a binary map is a 0/1-kernel correlation followed by a
``> 0`` threshold — exact for binary inputs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

LOWER_THRES = 1.0 / 255.0
UPPER_THRES = 254.0 / 255.0

# eval-mode compute_unknown backend: "auto" = Pallas fused kernel on TPU
# (bit-identical to the XLA path — tests/test_pallas_unknown.py — but immune
# to the bad layouts XLA assigns these C=1 map chains inside large eval
# graphs; 2x faster even isolated on v5e), XLA elsewhere
PALLAS_UNKNOWN = "auto"


def _use_pallas_unknown() -> bool:
    if PALLAS_UNKNOWN == "on":
        return True
    if PALLAS_UNKNOWN == "off":
        return False
    return jax.default_backend() in ("tpu", "axon")


@functools.lru_cache(maxsize=64)
def ellipse_kernel(width: int) -> np.ndarray:
    """cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (width, width)) replica."""
    r = width // 2
    c = width // 2
    inv_r2 = 1.0 / (r * r) if r > 0 else 0.0
    k = np.zeros((width, width), dtype=np.uint8)
    for i in range(width):
        dy = i - r
        if abs(dy) <= r:
            if r > 0:
                # cv2 uses saturate_cast<int> == round-half-to-even on the double
                dx = int(np.round(c * np.sqrt(max(r * r - dy * dy, 0) * inv_r2)))
            else:
                dx = 0
            j1 = max(c - dx, 0)
            j2 = min(c + dx + 1, width)
            k[i, j1:j2] = 1
    return k


@functools.lru_cache(maxsize=64)
def _embedded_offset_kernel(width: int, buf: int) -> np.ndarray:
    """Embed the width-sized SE into a (buf, buf) offset-centred kernel.

    Entry [buf//2 + dy, buf//2 + dx] = SE[anchor + (dy, dx)] where anchor = width//2
    (cv2's default anchor). ``buf`` must be odd and >= the SE's max offset span.
    """
    assert buf % 2 == 1
    se = ellipse_kernel(width)
    a = width // 2
    out = np.zeros((buf, buf), dtype=np.float32)
    for sy in range(width):
        for sx in range(width):
            if se[sy, sx]:
                dy, dx = sy - a, sx - a
                out[buf // 2 + dy, buf // 2 + dx] = 1.0
    return out


def _odd_buf(max_width: int) -> int:
    b = max_width if max_width % 2 == 1 else max_width + 1
    return max(b, 3)


@functools.lru_cache(maxsize=64)
def _ellipse_row_runs(width: int) -> tuple[tuple[int, int, int], ...]:
    """Decompose the SE into per-row horizontal runs: (dy, a, b) meaning the SE
    covers offsets (dy, dx) for dx in [a, b]. Exact for cv2's even-width anchors."""
    se = ellipse_kernel(width)
    anchor = width // 2
    runs = []
    for sy in range(width):
        cols = np.nonzero(se[sy])[0]
        if len(cols) == 0:
            continue
        runs.append((sy - anchor, int(cols[0] - anchor), int(cols[-1] - anchor)))
    return tuple(runs)


def _hmax_run(x: jax.Array, a: int, b: int) -> jax.Array:
    """out[..., j] = max over x[..., j+a : j+b+1] (zero padded). x: (N, H, W, 1)."""
    n = b - a + 1
    if n == 1 and a == 0:
        return x
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.max,
        window_dimensions=(1, 1, n, 1), window_strides=(1, 1, 1, 1),
        padding=[(0, 0), (0, 0), (-a, b), (0, 0)])


def dilate_ellipse(binary: jax.Array, width: int) -> jax.Array:
    """Dilate binary maps (..., H, W) with a cv2 MORPH_ELLIPSE element of ``width``.

    Exact match of ``cv2.dilate(x, Kernels[width])`` for 0/1 inputs
    (reference ``maggie/utils/utils.py:27,50``). Instead of a width^2-tap conv, the
    convex SE is decomposed into per-row horizontal runs: a cheap 1D max-pool per
    distinct run plus a vertical shift-max — O(width) VPU work per pixel instead of
    O(width^2) MACs. (cv2.dilate's out-of-border value never wins a max over a 0/1
    map, so zero padding is exact.)
    """
    if width <= 1:
        return binary
    lead = binary.shape[:-2]
    H, W = binary.shape[-2:]
    x = binary.reshape((-1, H, W, 1)).astype(jnp.float32)

    runs = _ellipse_row_runs(width)
    # horizontal max per distinct run extent
    hmax: dict[tuple[int, int], jax.Array] = {}
    for _, a, b in runs:
        if (a, b) not in hmax:
            hmax[(a, b)] = _hmax_run(x, a, b)
    # vertical shift-max: out[y] = max_dy hmax[run(dy)][y + dy]
    out = None
    for dy, a, b in runs:
        h = hmax[(a, b)]
        if dy > 0:
            shifted = jnp.pad(h[:, dy:], ((0, 0), (0, dy), (0, 0), (0, 0)))
        elif dy < 0:
            shifted = jnp.pad(h[:, :dy], ((0, 0), (-dy, 0), (0, 0), (0, 0)))
        else:
            shifted = h
        out = shifted if out is None else jnp.maximum(out, shifted)
    out = out > 0.0
    return out.reshape(lead + (H, W)).astype(binary.dtype)


def dilate_ellipse_random(binary: jax.Array, k_size: int, rng: jax.Array) -> jax.Array:
    """Per-map random-width elliptical dilation, the train-mode branch of
    ``compute_unknown`` (reference ``maggie/utils/utils.py:46-47``:
    ``width = np.random.randint(1, k_size)`` independently per map).

    Implemented as one grouped conv with a per-map kernel selected from the
    precomputed bank of all widths in [1, k_size).
    """
    lead = binary.shape[:-2]
    n = int(np.prod(lead)) if lead else 1
    h, w = binary.shape[-2:]
    buf = _odd_buf(k_size - 1)
    bank = np.stack([_embedded_offset_kernel(wd, buf) for wd in range(1, k_size)], 0)
    bank_j = jnp.asarray(bank)  # (k_size-1, buf, buf)
    widths = jax.random.randint(rng, (n,), 1, k_size)
    kernels = bank_j[widths - 1]  # (n, buf, buf)
    x = binary.reshape((1, n, h, w)).astype(jnp.float32)  # NCHW with C=n
    y = jax.lax.conv_general_dilated(
        x, kernels[:, None, :, :],  # (n, 1, buf, buf) OIHW
        window_strides=(1, 1),
        padding=[(buf // 2, buf // 2), (buf // 2, buf // 2)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=n,
    )
    return (y > 0.0).reshape(binary.shape).astype(binary.dtype)


def compute_unknown(
    masks: jax.Array,
    k_size: int = 30,
    is_train: bool = False,
    rng: jax.Array | None = None,
    lower_thres: float = LOWER_THRES,
    upper_thres: float = UPPER_THRES,
) -> jax.Array:
    """Uncertainty region: threshold to (lower, upper) then elliptical dilation.

    On-device equivalent of reference ``maggie/utils/utils.py:28-55``. Eval uses a
    fixed width ``k_size // 2``; train randomizes the width per map (pass ``rng``).
    Returns a 0/1 map with the input's dtype semantics (uint8-like float mask).
    """
    if is_train:
        assert rng is not None, "compute_unknown(is_train=True) needs an rng"
        uncertain = ((masks > lower_thres) & (masks < upper_thres)).astype(jnp.float32)
        out = dilate_ellipse_random(uncertain, k_size, rng)
        return out.astype(masks.dtype)
    if _use_pallas_unknown() and lower_thres == LOWER_THRES and upper_thres == UPPER_THRES:
        from .pallas.unknown import compute_unknown_pallas
        return compute_unknown_pallas(masks, k_size=k_size)
    uncertain = ((masks > lower_thres) & (masks < upper_thres)).astype(jnp.float32)
    out = dilate_ellipse(uncertain, k_size // 2)
    return out.astype(masks.dtype)
