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


def dilate_ellipse(binary: jax.Array, width: int) -> jax.Array:
    """Dilate binary maps (..., H, W) with a cv2 MORPH_ELLIPSE element of ``width``.

    Exact match of ``cv2.dilate(x, Kernels[width])`` for 0/1 inputs
    (reference ``maggie/utils/utils.py:27,50``).
    """
    if width <= 1:
        return binary
    buf = _odd_buf(width)
    k = jnp.asarray(_embedded_offset_kernel(width, buf))
    lead = binary.shape[:-2]
    x = binary.reshape((-1, binary.shape[-2], binary.shape[-1], 1)).astype(jnp.float32)
    # cv2 dilation dst(p) = max_{s in SE} src(p + s - anchor); for binary inputs this is
    # correlation with the offset kernel followed by a >0 threshold. cv2 replicates the
    # border, but for dilation of a 0/1 map zero-padding is NOT equivalent at borders:
    # replicate-pad first to match cv2's BORDER_CONSTANT(+inf for dilate) semantics.
    # cv2.dilate default borderValue = -inf for max => border does not contribute; zero
    # padding has the same effect for binary maps (0 never wins a max over >=0 values).
    y = jax.lax.conv_general_dilated(
        x, k[:, :, None, None],
        window_strides=(1, 1),
        padding=[(buf // 2, buf // 2), (buf // 2, buf // 2)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    out = (y > 0.0)
    return out.reshape(lead + binary.shape[-2:]).astype(binary.dtype)


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
    uncertain = ((masks > lower_thres) & (masks < upper_thres)).astype(jnp.float32)
    if is_train:
        assert rng is not None, "compute_unknown(is_train=True) needs an rng"
        out = dilate_ellipse_random(uncertain, k_size, rng)
    else:
        out = dilate_ellipse(uncertain, k_size // 2)
    return out.astype(masks.dtype)
