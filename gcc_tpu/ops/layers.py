"""Core NHWC building blocks (TPU-native layouts, torch-parity semantics).

All activations are NHWC (channels-last) — the layout XLA:TPU tiles onto the
MXU — while the reference is NCHW CUDA (models/Pix2Pix.py etc.). Weight
layouts: conv kernels are HWIO; transpose-conv kernels are HWIO of the
*forward* conv they invert, applied via input-dilated conv, which is exactly
torch's ConvTranspose2d semantics (output = (i-1)s - 2p + k).

Norm semantics match torch defaults: BatchNorm eps 1e-5 / momentum 0.1
(running <- 0.9*running + 0.1*batch) with affine + tracked stats;
InstanceNorm affine-free, eps 1e-5 (torch nn.InstanceNorm2d defaults, as used
by CycleGAN, models/CycleGAN.py:15-28).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

Dtype = Any


def conv_init(std: float = 0.02) -> Callable:
    """N(0, 0.02) init for conv/linear weights (utils/util.py:266-268)."""
    def init(key, shape, dtype=jnp.float32):
        return jax.random.normal(key, shape, dtype) * std
    return init


def norm_scale_init(std: float = 0.02) -> Callable:
    """BatchNorm scale ~ N(1, 0.02) (utils/util.py:281-282)."""
    def init(key, shape, dtype=jnp.float32):
        return 1.0 + jax.random.normal(key, shape, dtype) * std
    return init


def norm_bias_init() -> Callable:
    """BatchNorm bias ~ N(0, 1): the reference calls init.normal_(bias, 0.0)
    which leaves std at torch's default 1.0 (utils/util.py:283)."""
    def init(key, shape, dtype=jnp.float32):
        return jax.random.normal(key, shape, dtype)
    return init


class Conv(nn.Module):
    """2D conv, NHWC x HWIO -> NHWC. padding is symmetric per-side pixels."""

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: Any = 0  # int | ((t,b),(l,r)) | 'REFLECT:k' handled by caller
    use_bias: bool = True
    feature_group_count: int = 1
    kernel_init: Callable = conv_init()
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        pad = self.padding
        if isinstance(pad, int):
            pad = ((pad, pad), (pad, pad))
        kh, kw = self.kernel_size
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel", self.kernel_init,
            (kh, kw, in_ch // self.feature_group_count, self.features))
        dtype = self.dtype or x.dtype
        y = jax.lax.conv_general_dilated(
            x.astype(dtype), kernel.astype(dtype),
            window_strides=self.strides, padding=pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.feature_group_count,
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias
        return y.astype(dtype)


class ConvTranspose(nn.Module):
    """Transpose conv with torch ConvTranspose2d(k, s, p, output_padding) semantics.

    Implemented as an input-dilated conv with spatially-flipped kernel:
    out = (i-1)*s - 2p + k + output_padding. Kernel param is stored HWIO
    (kh, kw, in, out) and flipped/transposed at call time; XLA folds the
    flip into the conv.
    """

    features: int
    kernel_size: Tuple[int, int] = (4, 4)
    strides: Tuple[int, int] = (2, 2)
    padding: int = 1
    output_padding: int = 0
    use_bias: bool = True
    kernel_init: Callable = conv_init()
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kh, kw = self.kernel_size
        in_ch = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init,
                            (kh, kw, in_ch, self.features))
        dtype = self.dtype or x.dtype
        # gradient-of-conv trick: lhs_dilation=s, per-side pad k-1-p
        lo = kh - 1 - self.padding
        hi = kh - 1 - self.padding + self.output_padding
        k = jnp.flip(kernel, axis=(0, 1))
        y = jax.lax.conv_general_dilated(
            x.astype(dtype), k.astype(dtype),
            window_strides=(1, 1),
            padding=((lo, hi), (lo, hi)),
            lhs_dilation=self.strides,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias
        return y.astype(dtype)


class BatchNorm(nn.Module):
    """BatchNorm2d with torch semantics; cross-replica under pjit for free.

    Batch stats are computed with plain jnp reductions over (N,H,W): under a
    data-sharded mesh XLA lowers these to global reductions, so multi-chip
    training sees true global batch statistics (no axis_name plumbing).
    Running stats live in the ``batch_stats`` collection.
    """

    use_running_average: bool = False
    momentum: float = 0.1  # torch convention: new = (1-m)*old + m*batch
    epsilon: float = 1e-5
    scale_init: Callable = norm_scale_init()
    bias_init: Callable = norm_bias_init()

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        scale = self.param("scale", self.scale_init, (c,))
        bias = self.param("bias", self.bias_init, (c,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=(0, 1, 2))
            var = jnp.mean(jnp.square(xf), axis=(0, 1, 2)) - jnp.square(mean)
            if (not self.is_initializing()
                    and self.is_mutable_collection("batch_stats")):
                n = x.shape[0] * x.shape[1] * x.shape[2]
                unbias = n / max(n - 1, 1)  # torch stores unbiased running var
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * (var * unbias)
        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        y = (x.astype(jnp.float32) - mean) * inv + bias
        return y.astype(x.dtype)


class InstanceNorm(nn.Module):
    """InstanceNorm2d, affine-free (torch default), per-sample over (H,W)."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=(1, 2), keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        return y.astype(x.dtype)


class SeparableConv(nn.Module):
    """Depthwise conv + norm + 1x1 pointwise (models/Pix2Pix.py:132-145).

    The reference uses InstanceNorm between the two convs by default.
    """

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: int = 0
    use_bias: bool = True
    scale_factor: int = 1

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_ch = x.shape[-1]
        y = Conv(in_ch * self.scale_factor, self.kernel_size, self.strides,
                 self.padding, use_bias=self.use_bias,
                 feature_group_count=in_ch, name="depthwise")(x)
        y = InstanceNorm(name="norm")(y)
        y = Conv(self.features, (1, 1), (1, 1), 0, use_bias=self.use_bias,
                 name="pointwise")(y)
        return y


class SubPixelConv(nn.Module):
    """conv -> pixel-shuffle(r) -> PReLU (models/SRGAN.py:71-101)."""

    n_channels: int
    kernel_size: Tuple[int, int] = (3, 3)
    scaling_factor: int = 2

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        r = self.scaling_factor
        k = self.kernel_size
        y = Conv(self.n_channels * r * r, k, (1, 1), k[0] // 2, name="conv")(x)
        y = pixel_shuffle(y, r)
        return PReLU(name="prelu")(y)


def pixel_shuffle(x: jax.Array, r: int) -> jax.Array:
    """Depth-to-space matching torch.nn.PixelShuffle channel ordering.

    torch input channel layout is (C, r, r) row-major over NCHW; in NHWC the
    trailing axis must be unpacked as (C, r, r) then interleaved.
    """
    n, h, w, crr = x.shape
    c = crr // (r * r)
    x = x.reshape(n, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # n, h, r, w, r, c
    return x.reshape(n, h * r, w * r, c)


class PReLU(nn.Module):
    """Single-parameter PReLU (torch nn.PReLU() default, init 0.25)."""

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        a = self.param("alpha", lambda k, s: jnp.full(s, 0.25, jnp.float32), ())
        return jnp.where(x >= 0, x, a.astype(x.dtype) * x)


class Dense(nn.Module):
    features: int
    use_bias: bool = True
    kernel_init: Callable = conv_init()

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kernel = self.param("kernel", self.kernel_init,
                            (x.shape[-1], self.features))
        y = jnp.dot(x, kernel.astype(x.dtype),
                    preferred_element_type=jnp.float32).astype(x.dtype)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias
        return y


def leaky_relu(x, slope=0.2):
    return jnp.where(x >= 0, x, slope * x)


def reflect_pad(x: jax.Array, pad: int) -> jax.Array:
    """ReflectionPad2d on NHWC."""
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")


def adaptive_avg_pool(x: jax.Array, out_hw: Tuple[int, int] = (1, 1)) -> jax.Array:
    """AdaptiveAvgPool2d — only the (1,1) global case is needed (SRGAN.py:230)."""
    if out_hw != (1, 1):
        raise NotImplementedError("only global average pooling is supported")
    return jnp.mean(x, axis=(1, 2))
