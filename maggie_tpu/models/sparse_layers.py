"""Dense-masked equivalents of the spconv layers used by the MaGGIe detail decoder.

The reference delegates its sparse refinement to spconv-cu120 CUDA kernels
(``decoder/resnet_inst_matt_spconv.py:61-130``). On TPU the same *semantics* are
expressed with static shapes:

- a **submanifold conv** (``SubMConv2d``) computes, at every active site, a window
  conv over *active inputs only*: ``conv(x * m) * m`` for binary mask m;
- a **stride-2 sparse conv** (``SparseConv2d``) activates every coarse site whose
  window touches an active fine site: active-set transfer is ``maxpool(k=3,s=2,p=1)``;
- a **sparse inverse conv** (``SparseInverseConv2d``, paired via ``indice_key``)
  scatters coarse features back to the *stored* fine active set: a stride-2
  transposed conv (torch ``output_padding=1`` geometry) masked by the fine set;
- ``BatchNorm1d`` over sparse features = batch norm whose statistics run over
  ACTIVE SITES only (masked mean/var), not all pixels.

This is the exact-math oracle; the fixed-capacity block-sparse Pallas path (see
``maggie_tpu/ops/pallas``) must match it. Masks are (N, H, W, 1) float 0/1, features
NHWC.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn


def active_mask_downsample(mask: jax.Array) -> jax.Array:
    """Active-set transfer of a k=3 s=2 p=1 sparse conv: out site active iff any
    active input lies in its window — i.e. maxpool(k=3, s=2, p=1)."""
    return jax.lax.reduce_window(
        mask, -jnp.inf, jax.lax.max,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 2, 2, 1),
        padding=[(0, 0), (1, 1), (1, 1), (0, 0)],
    )


def active_pyramid(m1: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """(m1, m2, m4, m8) active masks, mirroring the reference's ``dummy_downscale``
    index-book construction (``resnet_inst_matt_spconv.py:61-66,217-218``)."""
    m2 = active_mask_downsample(m1)
    m4 = active_mask_downsample(m2)
    m8 = active_mask_downsample(m4)
    return m1, m2, m4, m8


class SubMConv(nn.Module):
    """Submanifold conv: conv over masked input, output masked to the active set."""

    features: int
    kernel_size: int = 3
    use_bias: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array) -> jax.Array:
        k = self.kernel_size
        kernel = self.param("weight", nn.initializers.xavier_uniform(),
                            (k, k, x.shape[-1], self.features))
        xm = x * mask.astype(x.dtype)
        y = jax.lax.conv_general_dilated(
            xm, kernel.astype(xm.dtype),
            window_strides=(1, 1),
            padding=[(k // 2, k // 2), (k // 2, k // 2)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (self.features,)).astype(y.dtype)
        return y * mask.astype(y.dtype)


class SparseInverseConv(nn.Module):
    """Inverse of a paired k=3 s=2 p=1 sparse conv: coarse -> stored fine active set.

    Geometry is a stride-2 transposed conv with torch ``output_padding=1`` so the
    output is exactly 2x the coarse size; output masked by the fine active set.
    """

    features: int
    kernel_size: int = 3
    use_bias: bool = False

    @nn.compact
    def __call__(self, x_coarse: jax.Array, mask_coarse: jax.Array, mask_fine: jax.Array) -> jax.Array:
        k = self.kernel_size
        kernel = self.param("weight", nn.initializers.xavier_uniform(),
                            (k, k, x_coarse.shape[-1], self.features))
        xm = x_coarse * mask_coarse.astype(x_coarse.dtype)
        kernel = kernel.astype(xm.dtype)
        # lhs-dilated correlation with the flipped kernel (k=3 s=2 p=1 op=1 geometry).
        # Measured on v5e this beats an output-phase decomposition whose
        # depth-to-space interleave dominates; see tools/microbench_invconv.py.
        pad_lo = k - 1 - 1  # torch padding=1
        pad_hi = pad_lo + 1  # output_padding=1 restores the even size
        y = jax.lax.conv_general_dilated(
            xm, jnp.flip(kernel, axis=(0, 1)),
            window_strides=(1, 1),
            padding=[(pad_lo, pad_hi), (pad_lo, pad_hi)],
            lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (self.features,)).astype(y.dtype)
        return y * mask_fine.astype(y.dtype)


class MaskedBatchNorm(nn.Module):
    """BatchNorm1d over sparse features: statistics over active sites only.

    torch semantics: eps 1e-5, momentum 0.1, biased variance for normalization,
    unbiased for the running estimate.

    ``stats_mask``: optional stricter mask for the STATISTICS only (normalization
    still covers every ``mask`` site). The block-sparse train path passes the
    halo-free core windows here so each active site is counted exactly once —
    making block-mode batch statistics GLOBAL (identical to the dense oracle when
    no blocks overflow the capacity), the sparse analogue of SyncBN.
    """

    momentum: float = 0.1
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array, train: bool = False,
                 stats_mask: jax.Array | None = None) -> jax.Array:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((c,)))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((c,)))

        if train:
            m = (mask if stats_mask is None else stats_mask).astype(jnp.float32)
            count = jnp.maximum(jnp.sum(m), 1.0)
            xm = x.astype(jnp.float32) * m
            mean = jnp.sum(xm, axis=(0, 1, 2)) / count
            var = jnp.sum(jnp.square(x.astype(jnp.float32) - mean) * m, axis=(0, 1, 2)) / count
            if not self.is_initializing():
                unbiased = var * count / jnp.maximum(count - 1.0, 1.0)
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value
        y = ((x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.epsilon)
             * scale + bias)
        return (y * mask.astype(y.dtype)).astype(x.dtype)
