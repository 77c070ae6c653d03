"""StyleGAN2 layer library — TPU-native (flax.linen, NHWC, MXU-shaped convs).

Re-designs the reference layer semantics (``/root/reference/layers.py``) for
TPU/XLA:

- equalized learning rate: weights init N(0,1)(/lr_mul) and are scaled at
  runtime by ``1/sqrt(fan_in)`` (·lr_mul) — identical math to the reference.
- ``ModulatedConv2d`` uses the *activation-scaling* formulation: scale the
  inputs by the per-sample style, convolve with the shared weight, then scale
  outputs by the demodulation factor. This is algebraically identical to the
  reference's per-sample weight modulation + grouped-conv trick
  (``layers.py:259-323``) but keeps one large MXU-friendly convolution and
  never materializes per-sample weights.
- all resampling goes through ``ops.upfirdn2d`` (one fused XLA conv); all
  activations through ``ops.fused_leaky_relu`` (XLA fuses the epilogue).

Layout: NHWC. Conv kernels are stored HWIO.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

from stylerenderer_tpu.ops.fused_act import fused_leaky_relu, scaled_leaky_relu
from stylerenderer_tpu.ops.upfirdn2d import blur as fir_blur
from stylerenderer_tpu.ops.upfirdn2d import downsample2d, make_kernel, upsample2d

Dtype = Any


class PixelNorm(nn.Module):
    """x * rsqrt(mean(x^2, -1) + eps) over the feature axis (layers.py:100-105)."""

    eps: float = 1e-8

    @nn.compact
    def __call__(self, x):
        return x * lax.rsqrt(jnp.mean(jnp.square(x), -1, keepdims=True) + self.eps)


class EqualLinear(nn.Module):
    """Linear with runtime weight scale ``lr_mul/sqrt(in)`` (layers.py:222-251)."""

    out_dim: int
    use_bias: bool = True
    bias_init: float = 0.0
    lr_mul: float = 1.0
    activation: str | None = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        w = self.param(
            "weight",
            lambda key, shape: jax.random.normal(key, shape) / self.lr_mul,
            (in_dim, self.out_dim),
        )
        scale = (1.0 / math.sqrt(in_dim)) * self.lr_mul
        b = None
        if self.use_bias:
            b = self.param(
                "bias", nn.initializers.constant(self.bias_init), (self.out_dim,)
            )
        y = jnp.dot(x.astype(self.dtype), (w * scale).astype(self.dtype))
        if self.activation == "fused_lrelu":
            return fused_leaky_relu(y, b * self.lr_mul if b is not None else None)
        if b is not None:
            y = y + (b * self.lr_mul).astype(y.dtype)
        if self.activation == "relu":
            y = jax.nn.relu(y)
        elif self.activation == "lrelu":
            y = jax.nn.leaky_relu(y, 0.2)
        elif self.activation == "selu":
            y = jax.nn.selu(y)
        elif self.activation == "tanh":
            y = jnp.tanh(y)
        elif self.activation not in (None, "fused_lrelu"):
            raise ValueError(f"unknown activation {self.activation!r}")
        return y


class EqualConv2d(nn.Module):
    """Conv with runtime 1/sqrt(fan_in) weight scale (layers.py:204-221). NHWC/HWIO."""

    out_channel: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_channel = x.shape[-1]
        k = self.kernel_size
        w = self.param(
            "weight",
            nn.initializers.normal(stddev=1.0),
            (k, k, in_channel, self.out_channel),
        )
        scale = 1.0 / math.sqrt(in_channel * k * k)
        y = lax.conv_general_dilated(
            x.astype(self.dtype),
            (w * scale).astype(self.dtype),
            window_strides=(self.stride, self.stride),
            padding=((self.padding, self.padding), (self.padding, self.padding)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.out_channel,))
            y = y + b.astype(y.dtype)
        return y


class Blur(nn.Module):
    """FIR blur with explicit pads (layers.py:194-203)."""

    kernel: Sequence[int] = (1, 3, 3, 1)
    pad: tuple[int, int] = (0, 0)
    upsample_factor: int = 1

    @nn.compact
    def __call__(self, x):
        k = make_kernel(list(self.kernel))
        return fir_blur(x, k, self.pad, self.upsample_factor)


class Upsample(nn.Module):
    """FIR 2x upsample (layers.py:170-181)."""

    kernel: Sequence[int] = (1, 3, 3, 1)
    factor: int = 2

    @nn.compact
    def __call__(self, x):
        return upsample2d(x, make_kernel(list(self.kernel)), self.factor)


class Downsample(nn.Module):
    """FIR 2x downsample (layers.py:182-193)."""

    kernel: Sequence[int] = (1, 3, 3, 1)
    factor: int = 2

    @nn.compact
    def __call__(self, x):
        return downsample2d(x, make_kernel(list(self.kernel)), self.factor)


def _conv_transpose2x(x, w, dtype):
    """Stride-2 transposed conv, VALID padding, matching
    ``F.conv_transpose2d(x, w_t, stride=2, padding=0)`` with ``w`` in HWIO
    (the same orientation used for the forward conv). Implemented as an
    input-dilated convolution with the spatially-flipped kernel."""
    k = w.shape[0]
    return lax.conv_general_dilated(
        x.astype(dtype),
        jnp.flip(w, (0, 1)).astype(dtype),
        window_strides=(1, 1),
        padding=((k - 1, k - 1), (k - 1, k - 1)),
        lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


class ModulatedConv2d(nn.Module):
    """THE StyleGAN2 op (layers.py:259-323), activation-scaling formulation.

    y = demod ⊙ conv(x ⊙ style, scale·W); identical algebra to modulating the
    weights per sample (conv is linear in both operands), but MXU-shaped.
    """

    out_channel: int
    kernel_size: int
    style_dim: int
    demodulate: bool = True
    upsample: bool = False
    downsample: bool = False
    blur_kernel: Sequence[int] = (1, 3, 3, 1)
    dtype: Dtype = jnp.float32
    eps: float = 1e-8

    @nn.compact
    def __call__(self, x, style):
        in_channel = x.shape[-1]
        k = self.kernel_size
        w = self.param(
            "weight",
            nn.initializers.normal(stddev=1.0),
            (k, k, in_channel, self.out_channel),
        )
        scale = 1.0 / math.sqrt(in_channel * k * k)

        s = EqualLinear(in_channel, bias_init=1.0, name="modulation")(style)
        # [B, Cin] input-channel scales
        xs = x * s[:, None, None, :].astype(x.dtype)

        if self.demodulate:
            # demod[b,o] = rsqrt( sum_{h,w,i} (scale*W[h,w,i,o]*s[b,i])^2 + eps )
            w2 = jnp.sum(jnp.square(w * scale), axis=(0, 1))  # [Cin, Cout]
            demod = lax.rsqrt(
                jnp.einsum("bi,io->bo", jnp.square(s), w2) + self.eps
            )

        ws = (w * scale).astype(self.dtype)
        if self.upsample:
            y = _conv_transpose2x(xs, ws, self.dtype)
            if self.demodulate:
                y = y * demod[:, None, None, :].astype(y.dtype)
            factor = 2
            p = (len(self.blur_kernel) - factor) - (k - 1)
            pad0 = (p + 1) // 2 + factor - 1
            pad1 = p // 2 + 1
            y = Blur(self.blur_kernel, (pad0, pad1), upsample_factor=factor)(y)
        elif self.downsample:
            factor = 2
            p = (len(self.blur_kernel) - factor) + (k - 1)
            pad0 = (p + 1) // 2
            pad1 = p // 2
            xs = Blur(self.blur_kernel, (pad0, pad1))(xs)
            y = lax.conv_general_dilated(
                xs.astype(self.dtype), ws,
                window_strides=(2, 2), padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            if self.demodulate:
                y = y * demod[:, None, None, :].astype(y.dtype)
        else:
            y = lax.conv_general_dilated(
                xs.astype(self.dtype), ws,
                window_strides=(1, 1),
                padding=((k // 2, k // 2), (k // 2, k // 2)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            if self.demodulate:
                y = y * demod[:, None, None, :].astype(y.dtype)
        return y


class NoiseInjection(nn.Module):
    """image + learned_scalar * per-pixel noise (layers.py:324-332)."""

    @nn.compact
    def __call__(self, x, noise=None, rng=None):
        w = self.param("weight", nn.initializers.zeros, ())
        if noise is None:
            if rng is None:
                rng = self.make_rng("noise")
            b, h, ww, _ = x.shape
            noise = jax.random.normal(rng, (b, h, ww, 1), x.dtype)
        return x + w.astype(x.dtype) * noise


class ConstantInput(nn.Module):
    """Learned constant input map (layers.py:333-340)."""

    channel: int
    size: int = 4

    @nn.compact
    def __call__(self, batch: int):
        c = self.param(
            "input", nn.initializers.normal(stddev=1.0),
            (1, self.size, self.size, self.channel),
        )
        return jnp.tile(c, (batch, 1, 1, 1))


class ConvLayer(nn.Module):
    """[Blur if down] + EqualConv2d + fused lrelu (layers.py:341-378)."""

    out_channel: int
    kernel_size: int
    downsample: bool = False
    blur_kernel: Sequence[int] = (1, 3, 3, 1)
    use_bias: bool = True
    activate: str | bool = "lrelu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.downsample:
            factor = 2
            p = (len(self.blur_kernel) - factor) + (self.kernel_size - 1)
            x = Blur(self.blur_kernel, ((p + 1) // 2, p // 2))(x)
            stride, padding = 2, 0
        else:
            stride, padding = 1, self.kernel_size // 2
        if isinstance(self.activate, str) and "sp" in self.activate.lower():
            # spectral-norm conv, no activation (layers.py:357-364)
            from stylerenderer_tpu.nn.spectral import SpectralEqualConv2d

            return SpectralEqualConv2d(
                self.out_channel, self.kernel_size, stride, padding,
                use_bias=self.use_bias, name="conv_sp",
            )(x)
        x = EqualConv2d(
            self.out_channel, self.kernel_size, stride, padding,
            use_bias=self.use_bias, dtype=self.dtype, name="conv",
        )(x)
        if self.activate == "lrelu":
            if self.use_bias:
                b = self.param("act_bias", nn.initializers.zeros, (self.out_channel,))
                x = fused_leaky_relu(x, b)
            else:
                x = scaled_leaky_relu(x)
        return x


class ResBlock(nn.Module):
    """conv3x3 + (down)conv3x3 with 1x1 skip, /sqrt(2) (layers.py:379-391)."""

    out_channel: int
    blur_kernel: Sequence[int] = (1, 3, 3, 1)
    downsample: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_channel = x.shape[-1]
        out = ConvLayer(in_channel, 3, dtype=self.dtype, name="conv1")(x)
        out = ConvLayer(
            self.out_channel, 3, downsample=self.downsample,
            blur_kernel=self.blur_kernel, dtype=self.dtype, name="conv2",
        )(out)
        skip = ConvLayer(
            self.out_channel, 1, downsample=self.downsample,
            blur_kernel=self.blur_kernel, use_bias=False, activate=False,
            dtype=self.dtype, name="skip",
        )(x)
        return (out + skip) / math.sqrt(2)


def minibatch_stddev(x, group_size: int = 4, num_features: int = 1):
    """Minibatch standard-deviation channel (model.py:317-332), NHWC."""
    b, h, w, c = x.shape
    g = min(b, group_size)
    f = num_features
    y = x.reshape(g, b // g, h, w, f, c // f)
    var = jnp.var(y, axis=0)  # biased, matches unbiased=False
    std = jnp.sqrt(var + 1e-8)  # [b//g, h, w, f, c//f]
    std = jnp.mean(std, axis=(1, 2, 4))  # mean over (H, W, C//f) -> [b//g, f]
    std = jnp.tile(std[None, :, None, None, :], (g, 1, h, w, 1)).reshape(b, h, w, f)
    return jnp.concatenate([x, std.astype(x.dtype)], axis=-1)
