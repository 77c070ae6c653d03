"""Fused bias-add + LeakyReLU + gain.

Matches the reference (``/root/reference/op/fused_act.py:86-97`` CPU branch and
``op/fused_bias_act_kernel.cu``): ``leaky_relu(x + b, 0.2) * sqrt(2)`` with the
bias broadcast over the channel axis.

TPU-native design note: this is a pure elementwise epilogue. XLA fuses it into
the producing convolution/matmul automatically (one HBM round-trip), which is
exactly what the reference's hand-written CUDA kernel buys on GPU — so the
idiomatic TPU implementation is plain jnp, kept in one place so the compiler
sees a single canonical pattern. Gradients (any order) come from JAX autodiff
and agree with the reference's hand-derived first/second grads
(``fused_bias_act_kernel.cu:30-39``; its second-grad-of-sign terms are 0).
"""

from __future__ import annotations

import math

import jax.numpy as jnp

SQRT2 = math.sqrt(2.0)


def fused_leaky_relu(
    x: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    negative_slope: float = 0.2,
    scale: float = SQRT2,
    axis: int = -1,
) -> jnp.ndarray:
    """``leaky_relu(x + bias, negative_slope) * scale``.

    Args:
      x: any-rank input.
      bias: ``[C]`` bias broadcast along ``axis`` (default: last axis — NHWC
        channels; the reference broadcasts along dim 1 in NCHW).
      negative_slope / scale: activation parameters (defaults 0.2, sqrt(2)).
      axis: channel axis for the bias broadcast.
    """
    if bias is not None:
        shape = [1] * x.ndim
        shape[axis] = bias.shape[0]
        x = x + bias.reshape(shape).astype(x.dtype)
    return jnp.where(x >= 0, x, x * negative_slope) * jnp.asarray(scale, x.dtype)


def scaled_leaky_relu(x: jnp.ndarray, negative_slope: float = 0.2) -> jnp.ndarray:
    """LeakyReLU followed by a sqrt(2) gain (reference ``layers.py:252-258``)."""
    return jnp.where(x >= 0, x, x * negative_slope) * jnp.asarray(SQRT2, x.dtype)
