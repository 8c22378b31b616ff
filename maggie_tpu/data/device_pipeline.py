"""Jit-compiled eval preprocessing tail (the north-star input-pipeline clause).

Host keeps only the irreducible work — image/PNG DECODE — and the device runs
the rest of the eval transform chain under jit: short-side bilinear resize,
pad-to-x64, ImageNet normalization, nearest mask resize and the /8 mask
downscale. Semantics mirror ``data/transforms.py`` (reference
``maggie/dataloader/transforms.py:104-166,772-810``):

- frame resize: cv2.INTER_LINEAR == half-pixel bilinear (``ops/resize``).
  cv2's uint8 path is 5-bit fixed-point, so device f32 results differ by up to
  ~1/255 per pixel (tested tolerance); alphas/trimaps for METRICS stay on the
  exact host path, so metric parity is untouched.
- at ratio == 1 (source already at eval size) there is no resize and the
  normalization goes through a 256-entry lookup table built host-side with the
  host path's exact float64 arithmetic — the device model input is then
  BIT-IDENTICAL to the host transform chain (uint8 has only 256 values per
  channel, so the f64-rounded normalize is a table lookup).
- mask resizes: cv2.INTER_NEAREST maps dst j -> floor(j * src/dst) computed in
  double (empirically pinned); the index maps are built host-side in float64
  exactly like cv2 and baked into the jit as constants — bit-exact.

One compile per distinct (source shape, n_i); source images from one dataset
usually share a shape. Enabled with ``dataset.test.device_preprocess`` (off by
default; the host path remains the parity reference).
"""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def _normalize_lut() -> np.ndarray:
    """(256, 3) f32 table: ``Normalize``'s exact result for every uint8 value.

    The host chain is ``(f.astype(f32) / 255.0 - mean_f32) / std_f32`` — all
    float32 (NumPy keeps the array dtype against Python scalars)
    (``data/transforms.py:Normalize``, reference ``transforms.py:772-810``) —
    replicated here op-for-op so a table lookup is bit-identical to the host
    per-pixel arithmetic."""
    v = np.arange(256, dtype=np.float32)[:, None] / 255.0
    return ((v - IMAGENET_MEAN) / IMAGENET_STD).astype(np.float32)


def _cv2_nearest_map(src: int, dst: int) -> np.ndarray:
    """cv2.INTER_NEAREST source index per destination index (double floor)."""
    scale = np.float64(src) / np.float64(dst)
    return np.minimum(np.floor(np.arange(dst, dtype=np.float64) * scale),
                      src - 1).astype(np.int32)


@lru_cache(maxsize=64)
def _make_tail(h0: int, w0: int, n_i: int, short_size: int, divisor: int,
               downscale_mask: bool):
    import jax
    import jax.numpy as jnp
    from ..ops.resize import resize_bilinear_nhwc

    ratio = short_size * 1.0 / min(w0, h0)
    oh, ow = (int(h0 * ratio), int(w0 * ratio)) if ratio != 1 else (h0, w0)
    ph = (divisor - oh % divisor) % divisor
    pw = (divisor - ow % divisor) % divisor
    hp, wp = oh + ph, ow + pw

    # nearest index maps (host float64, cv2-exact); the /8 stage composes with
    # the padded intermediate exactly like the host's two cv2.resize calls
    ys = _cv2_nearest_map(h0, oh)
    xs = _cv2_nearest_map(w0, ow)
    y8 = _cv2_nearest_map(hp, hp // 8)
    x8 = _cv2_nearest_map(wp, wp // 8)

    lut = _normalize_lut()

    @jax.jit
    def tail(frame_u8, masks_u8):
        if (oh, ow) != (h0, w0):
            f = frame_u8.astype(jnp.float32)
            f = resize_bilinear_nhwc(f[None], (oh, ow), align_corners=False)[0]
            f = jnp.pad(f, ((0, ph), (0, pw), (0, 0)))
            f = (f / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
        else:
            # no resize: pad the raw uint8 (host pads before Normalize, so the
            # pad region is normalize(0) there too), then LUT — bit-identical
            # to the host transform chain
            fu = jnp.pad(frame_u8, ((0, ph), (0, pw), (0, 0)))
            idx = fu.astype(jnp.int32) + 256 * jnp.arange(3, dtype=jnp.int32)
            f = jnp.take(jnp.asarray(lut.T.reshape(-1)), idx)

        m = masks_u8[:, ys][:, :, xs]                      # (n_i, oh, ow)
        m = jnp.pad(m, ((0, 0), (0, ph), (0, pw)))
        if downscale_mask:
            m = m[:, y8][:, :, x8]
        m = m.astype(jnp.float32) / 255.0
        return f[None], m[None]                            # (1,H,W,3), (1,n_i,h,w)

    info = [{"name": "resize", "ori_size": (h0, w0), "ratio": ratio},
            {"name": "padding", "pad_size": (ph, pw)}]
    return tail, info


def device_preprocess_eval(frame_u8: np.ndarray, masks_u8: np.ndarray,
                           short_size: int, divisor: int = 64,
                           downscale_mask: bool = True):
    """frame_u8 (H0,W0,3) uint8 RGB; masks_u8 (n_i,H0,W0) uint8 0/255.
    Returns (image (1,Hp,Wp,3) f32 device, mask (1,n_i,h,w) f32 device,
    transform_info)."""
    h0, w0 = frame_u8.shape[:2]
    tail, info = _make_tail(h0, w0, masks_u8.shape[0], short_size, divisor,
                            downscale_mask)
    image, mask = tail(frame_u8, masks_u8)
    return image, mask, [dict(d) for d in info]
