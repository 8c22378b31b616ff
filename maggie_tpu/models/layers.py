"""Core NN building blocks (NHWC, flax.linen) with torch-checkpoint-compatible params.

Covers the reference's module zoo (``maggie/network/module/``): the Self-Attention-GAN
style SpectralNorm wrapper (``spectral_norm.py:9-80``), GCA ResNet-D basic blocks for
encoder (``encoder/resnet.py:7-39``) and decoder (``decoder/resnet.py:9-45``).

Conventions:
- feature tensors are NHWC; conv kernels are stored HWIO.
- spectral-norm u/v vectors live in the ``spectral`` variable collection and are
  updated by one power iteration per call when ``update_sn`` is True (the reference
  mutates them on *every* forward, even in eval — ``spectral_norm.py:73-80``; we make
  eval deterministic instead, computing sigma from the stored u/v).
- batch stats live in flax's ``batch_stats`` collection. Under jit-over-mesh with a
  sharded batch, BN reductions are global, which subsumes the reference's SyncBN
  (``engine/train.py:160-161``).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import flax.linen as nn

EPS_L2NORM = 1e-12


def xavier_uniform() -> Callable:
    return nn.initializers.xavier_uniform()


def _sn_uv_init(rng, w_mat, n_iter: int = 10):
    """Converged u/v for spectral norm at INIT: torch starts u/v random and
    converges them across training forwards (spectral_norm.py:22-35); a random
    pair underestimates sigma badly, scaling fresh weights UP — stacked through
    ~20 SN convs that blew random-init activations to ~1e13 and made TCVOM's
    attention einsum overflow-order-sensitive under jit. Released-checkpoint
    u/v override these, so parity is unaffected."""
    u = _l2normalize(jax.random.normal(rng, (w_mat.shape[0],)))
    w32 = w_mat.astype(jnp.float32)
    for _ in range(n_iter):
        v = _l2normalize(w32.T @ u)
        u = _l2normalize(w32 @ v)
    return u, v


def _l2normalize(v: jax.Array) -> jax.Array:
    return v / (jnp.linalg.norm(v) + EPS_L2NORM)


class SNConv(nn.Module):
    """Conv2d wrapped in spectral norm (reference ``SpectralNorm(conv)``).

    The power iteration runs on the torch-flattened weight matrix ``(O, I*kh*kw)``
    so that converted ``weight_bar``/``u``/``v`` tensors from released checkpoints
    reproduce identical sigma values.
    """

    features: int
    kernel_size: tuple[int, int] = (3, 3)
    strides: tuple[int, int] = (1, 1)
    padding: tuple[int, int] = (1, 1)
    use_bias: bool = False
    kernel_init: Callable = nn.initializers.xavier_uniform()
    # space-to-depth lowering for the 3x3/stride-2/pad-1 case: mathematically
    # identical conv expressed on the (H/2, W/2, 4C) s2d tensor with a 2x2
    # kernel. Quadruples the MXU contraction depth for thin-channel full-res
    # stems (C=6 image+embed input) at 16/9 the MACs. Parameters are stored in
    # the ORIGINAL 3x3 layout (checkpoint- and spectral-norm-compatible); the
    # kernel is rearranged at trace time and constant-folded after SN folding.
    s2d: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, update_sn: bool = False) -> jax.Array:
        kh, kw = self.kernel_size
        in_ch = x.shape[-1]
        kernel = self.param("weight_bar", self.kernel_init, (kh, kw, in_ch, self.features))
        if self.is_initializing() or self.has_variable("spectral", "u"):
            # torch layout for the power iteration: (O, I, kh, kw).reshape(O, -1)
            w_mat = jnp.transpose(kernel, (3, 2, 0, 1)).reshape(self.features, -1)
            # one shared rng: u and v must come from the SAME iteration chain or
            # their signs can pair inconsistently (sigma would flip negative)
            _rng = self.make_rng("params") if self.is_initializing() else None
            u_var = self.variable(
                "spectral", "u", lambda: _sn_uv_init(_rng, w_mat)[0])
            v_var = self.variable(
                "spectral", "v", lambda: _sn_uv_init(_rng, w_mat)[1])
            u, v = u_var.value, v_var.value
            if update_sn and not self.is_initializing():
                w32 = w_mat.astype(jnp.float32)
                v = _l2normalize(w32.T @ u)
                u = _l2normalize(w32 @ v)
                u_var.value = u
                v_var.value = v
            sigma = u @ (w_mat.astype(jnp.float32) @ v)
            kernel = kernel / sigma.astype(kernel.dtype)
        # else: spectral collection folded into weight_bar (fold_spectral_norm)
        kernel = kernel.astype(x.dtype)

        if (self.s2d and self.kernel_size == (3, 3) and self.strides == (2, 2)
                and tuple(self.padding) == (1, 1)
                and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0):
            # y[i,j] = sum_{di,dj in 0..2} x[2i+di-1, 2j+dj-1] W[di,dj]. On the
            # s2d tensor z[p,q,(a,b,c)] = x[2p+a, 2q+b, c] the same sum is a 2x2
            # stride-1 conv with top/left padding 1 and kernel
            # K[A,B,(a,b,c)] = Wp[2A+a, 2B+b, c] where Wp is W zero-padded by one
            # row/col at the top/left (the (A,a)=(0,0) taps fall outside W).
            n, hh, ww, cc = x.shape
            z = x.reshape(n, hh // 2, 2, ww // 2, 2, cc)
            z = z.transpose(0, 1, 3, 2, 4, 5).reshape(n, hh // 2, ww // 2, 4 * cc)
            kp = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))
            k2 = kp.reshape(2, 2, 2, 2, cc, self.features)
            k2 = k2.transpose(0, 2, 1, 3, 4, 5).reshape(2, 2, 4 * cc, self.features)
            y = jax.lax.conv_general_dilated(
                z, k2, window_strides=(1, 1), padding=[(1, 0), (1, 0)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        else:
            y = jax.lax.conv_general_dilated(
                x, kernel,
                window_strides=self.strides,
                padding=[self.padding, self.padding] if isinstance(self.padding[0], int) else self.padding,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(y.dtype)
        return y


class SNConvTranspose(nn.Module):
    """Spectral-normed ConvTranspose2d(k=4, s=2, p=1) — the decoder upsampler
    (reference ``decoder/resnet.py:20,62``). Exact torch output semantics."""

    features: int
    kernel_size: tuple[int, int] = (4, 4)
    stride: int = 2
    torch_padding: int = 1
    kernel_init: Callable = nn.initializers.xavier_uniform()

    @nn.compact
    def __call__(self, x: jax.Array, update_sn: bool = False) -> jax.Array:
        kh, kw = self.kernel_size
        in_ch = x.shape[-1]
        # stored in torch ConvTranspose layout (I, O) on the channel dims of HWIO-like
        # buffer: we keep HWIO with I=in, O=out and flip spatially at use time.
        kernel = self.param("weight_bar", self.kernel_init, (kh, kw, in_ch, self.features))
        if self.is_initializing() or self.has_variable("spectral", "u"):
            # torch ConvTranspose2d weight is (I, O, kh, kw); power-iterate over (I, O*kh*kw)
            w_mat = jnp.transpose(kernel, (2, 3, 0, 1)).reshape(in_ch, -1)
            # one shared rng: u and v must come from the SAME iteration chain or
            # their signs can pair inconsistently (sigma would flip negative)
            _rng = self.make_rng("params") if self.is_initializing() else None
            u_var = self.variable(
                "spectral", "u", lambda: _sn_uv_init(_rng, w_mat)[0])
            v_var = self.variable(
                "spectral", "v", lambda: _sn_uv_init(_rng, w_mat)[1])
            u, v = u_var.value, v_var.value
            if update_sn and not self.is_initializing():
                w32 = w_mat.astype(jnp.float32)
                v = _l2normalize(w32.T @ u)
                u = _l2normalize(w32 @ v)
                u_var.value = u
                v_var.value = v
            sigma = u @ (w_mat.astype(jnp.float32) @ v)
            kernel = kernel / sigma.astype(kernel.dtype)
        # else: spectral collection folded into weight_bar (fold_spectral_norm)
        kernel = kernel.astype(x.dtype)

        # transposed conv == lhs-dilated correlation with the spatially-flipped
        # kernel. (Measured on v5e: this lowering beats an explicit output-phase
        # decomposition — the depth-to-space interleave there costs more than the
        # dilated conv saves; see tools/microbench_invconv.py.)
        pad = kh - 1 - self.torch_padding
        y = jax.lax.conv_general_dilated(
            x, jnp.flip(kernel, axis=(0, 1)),
            window_strides=(1, 1),
            padding=[(pad, pad), (pad, pad)],
            lhs_dilation=(self.stride, self.stride),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y


class Conv(nn.Module):
    """Plain Conv2d (torch padding semantics), NHWC."""

    features: int
    kernel_size: tuple[int, int] = (3, 3)
    strides: tuple[int, int] = (1, 1)
    padding: tuple[int, int] = (1, 1)
    dilation: tuple[int, int] = (1, 1)
    use_bias: bool = True
    feature_group_count: int = 1
    kernel_init: Callable = nn.initializers.xavier_uniform()

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kh, kw = self.kernel_size
        in_ch = x.shape[-1] // self.feature_group_count
        kernel = self.param("weight", self.kernel_init, (kh, kw, in_ch, self.features))
        y = jax.lax.conv_general_dilated(
            x, kernel.astype(x.dtype),
            window_strides=self.strides,
            padding=[self.padding, self.padding],
            rhs_dilation=self.dilation,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.feature_group_count,
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(y.dtype)
        return y


class BatchNorm(nn.Module):
    """BatchNorm2d with torch defaults (eps 1e-5, momentum 0.1)."""

    momentum: float = 0.9  # flax convention: ra = ra*m + batch*(1-m); torch 0.1 == flax 0.9
    epsilon: float = 1e-5
    scale_init: Callable = nn.initializers.ones
    bias_init: Callable = nn.initializers.zeros

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        # Mixed-precision contract: activations carry the compute dtype (bf16 under
        # ``--precision 16``), but BN statistics/normalization run in f32 (the AMP
        # float32-BN rule; reference autocast does the same) and the output is cast
        # back so the chain stays in the compute dtype.
        y = nn.BatchNorm(
            use_running_average=not train,
            momentum=self.momentum,
            epsilon=self.epsilon,
            scale_init=self.scale_init,
            bias_init=self.bias_init,
            name="bn",
        )(x.astype(jnp.float32))
        return y.astype(x.dtype)


def leaky_relu(x: jax.Array, slope: float = 0.2) -> jax.Array:
    return nn.leaky_relu(x, negative_slope=slope)


class BasicBlockEnc(nn.Module):
    """Encoder residual block (reference ``encoder/resnet.py:7-39``): SN conv3x3 -> BN
    -> ReLU -> SN conv3x3 -> BN (+ downsample identity) -> ReLU. ``bn2`` is
    zero-init'd so the branch starts as identity (``encoder/resnet.py:97-99``)."""

    planes: int
    stride: int = 1
    has_downsample: bool = False
    avg_pool_downsample: bool = False  # stride!=1 path uses AvgPool2d(2)+1x1

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False, update_sn: bool = False) -> jax.Array:
        identity = x
        out = SNConv(self.planes, (3, 3), (self.stride, self.stride), (1, 1), name="conv1")(x, update_sn)
        out = BatchNorm(name="bn1")(out, train)
        out = nn.relu(out)
        out = SNConv(self.planes, (3, 3), (1, 1), (1, 1), name="conv2")(out, update_sn)
        out = BatchNorm(scale_init=nn.initializers.zeros, name="bn2")(out, train)
        if self.has_downsample:
            d = x
            if self.avg_pool_downsample:
                from ..ops.resize import avg_pool2d as _ap
                n, h, w, c = d.shape
                d = _ap(jnp.transpose(d, (0, 3, 1, 2)), 2, self.stride)
                d = jnp.transpose(d, (0, 2, 3, 1))
            d = SNConv(self.planes, (1, 1), (1, 1), (0, 0), name="downsample_conv")(d, update_sn)
            d = BatchNorm(name="downsample_bn")(d, train)
            identity = d
        out = out + identity
        return nn.relu(out)


class BasicBlockDec(nn.Module):
    """Decoder residual block (reference ``decoder/resnet.py:9-45``): upsampling via
    SN ConvTranspose(k4 s2 p1) when stride>1; LeakyReLU(0.2); nearest-upsample+1x1
    shortcut."""

    planes: int
    stride: int = 1
    has_upsample: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False, update_sn: bool = False) -> jax.Array:
        identity = x
        in_ch = x.shape[-1]
        if self.stride > 1:
            out = SNConvTranspose(in_ch, name="conv1")(x, update_sn)
        else:
            out = SNConv(in_ch, (3, 3), (1, 1), (1, 1), name="conv1")(x, update_sn)
        out = BatchNorm(name="bn1")(out, train)
        out = leaky_relu(out)
        out = SNConv(self.planes, (3, 3), (1, 1), (1, 1), name="conv2")(out, update_sn)
        out = BatchNorm(scale_init=nn.initializers.zeros, name="bn2")(out, train)
        if self.has_upsample:
            d = x
            if self.stride > 1:
                n, h, w, c = d.shape
                d = jnp.repeat(jnp.repeat(d, 2, axis=1), 2, axis=2)  # UpsamplingNearest2d(2)
            d = SNConv(self.planes, (1, 1), (1, 1), (0, 0), name="upsample_conv")(d, update_sn)
            d = BatchNorm(name="upsample_bn")(d, train)
            identity = d
        out = out + identity
        return leaky_relu(out)


class ResLayerEnc(nn.Module):
    """Sequential stack of encoder BasicBlocks, reference ``_make_layer``
    (``encoder/resnet.py:106-128``)."""

    planes: int
    blocks: int
    stride: int = 1
    in_planes: int = 0  # for downsample decision when stride==1

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False, update_sn: bool = False) -> jax.Array:
        if self.blocks == 0:
            return x
        need_ds = self.stride != 1 or x.shape[-1] != self.planes
        x = BasicBlockEnc(
            self.planes, self.stride,
            has_downsample=need_ds,
            avg_pool_downsample=self.stride != 1,
            name="block0",
        )(x, train, update_sn)
        for i in range(1, self.blocks):
            x = BasicBlockEnc(self.planes, 1, name=f"block{i}")(x, train, update_sn)
        return x


class ResLayerDec(nn.Module):
    """Sequential stack of decoder BasicBlocks, reference ``decoder/resnet.py:110-132``."""

    planes: int
    blocks: int
    stride: int = 1

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False, update_sn: bool = False) -> jax.Array:
        if self.blocks == 0:
            return x
        need_us = self.stride != 1 or x.shape[-1] != self.planes
        x = BasicBlockDec(self.planes, self.stride, has_upsample=need_us, name="block0")(x, train, update_sn)
        for i in range(1, self.blocks):
            x = BasicBlockDec(self.planes, 1, name=f"block{i}")(x, train, update_sn)
        return x


class MLP(nn.Module):
    """Reference ``module/mask_attention.py:194-206``: Linear stack with ReLU between."""

    hidden_dim: int
    output_dim: int
    num_layers: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for i in range(self.num_layers):
            feats = self.output_dim if i == self.num_layers - 1 else self.hidden_dim
            x = nn.Dense(feats, name=f"layer{i}", dtype=x.dtype,
                         kernel_init=nn.initializers.xavier_uniform())(x)
            if i < self.num_layers - 1:
                x = nn.relu(x)
        return x
