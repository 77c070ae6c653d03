"""Spectral normalization + dominant-singular-pair utilities.

Reference ``layers.py:54-169``: SpectralNorm divides a weight by its top
singular value, estimated either by power iteration (stateful u/v vectors)
or exactly via the dominant singular pair (``BatchEigenMax``). The reference
hand-writes implicit-function VJPs for both; in JAX the closed forms are
natively differentiable, so no custom gradients are needed.
"""

from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def normalize_vec(v, axis=-1, kind: str = "L2", eps: float = 1e-8):
    """L2 / L1 / Linf normalization with clamped norms (layers.py:13-34)."""
    kind = kind.upper()
    if "L2" in kind:
        # clamp inside the sqrt: max(sqrt(n2), eps) == sqrt(max(n2, eps^2))
        # in value, but keeps the gradient finite at v == 0 (d sqrt -> inf)
        n2 = jnp.sum(v * v, axis, keepdims=True)
        return v / jnp.sqrt(jnp.maximum(n2, eps * eps))
    elif "L1" in kind:
        n = jnp.sum(v, axis, keepdims=True)
    elif "LINF" in kind:
        n = jnp.max(jnp.abs(v), axis, keepdims=True)
    else:
        raise ValueError(f"unknown norm {kind!r}")
    return v / jnp.maximum(n, eps)


def batch_eigen_max(A):
    """Dominant singular pair of a batch of matrices (layers.py:54-99).

    A: [B, n, m] -> (u [B, n] with sign fixed so u[-1] >= 0, sigma [B]).
    jnp.linalg.svd is differentiable, replacing the reference's hand-written
    implicit-function backward.
    """
    u, s, _ = jnp.linalg.svd(A, full_matrices=False)
    u0 = u[..., :, 0]
    s0 = s[..., 0]
    flip = u0[..., -1:] < 0
    u0 = jnp.where(flip, -u0, u0)
    return u0, s0


def spectral_sigma_exact(w: jnp.ndarray) -> jnp.ndarray:
    """Exact top singular value of a (reshaped-2D) weight."""
    m = w.reshape(w.shape[0], -1)
    if m.shape[0] > m.shape[1]:
        m = m.T
    _, s = batch_eigen_max(m[None])
    return s[0]


class SpectralNorm(nn.Module):
    """Wrap a weight-producing module with spectral normalization.

    Power-iteration state (u, v) lives in the ``spectral`` variable
    collection (mutable during training, like torch's buffers);
    ``power_iterations=0`` uses the exact singular value instead.
    """

    features: int
    weight_shape: tuple
    power_iterations: int = 1
    eps: float = 1e-8

    @nn.compact
    def __call__(self, apply_fn: Callable, *args):
        """apply_fn(normalized_weight, *args) with the managed weight."""
        w = self.param(
            "weight_bar", nn.initializers.normal(stddev=1.0), self.weight_shape
        )
        height = self.weight_shape[0]
        width = int(np.prod(self.weight_shape[1:]))
        w2d = w.reshape(height, width)
        if self.power_iterations > 0:
            u = self.variable(
                "spectral", "u",
                lambda: normalize_vec(
                    jax.random.normal(self.make_rng("params"), (height,))
                ),
            )
            v = self.variable(
                "spectral", "v",
                lambda: normalize_vec(
                    jax.random.normal(self.make_rng("params"), (width,))
                ),
            )
            uv, vv = u.value, v.value
            for _ in range(self.power_iterations):
                vv = normalize_vec(w2d.T @ uv, eps=self.eps)
                uv = normalize_vec(w2d @ vv, eps=self.eps)
            uv = jax.lax.stop_gradient(uv)
            vv = jax.lax.stop_gradient(vv)
            if not self.is_initializing():
                u.value = uv
                v.value = vv
            sigma = uv @ (w2d @ vv)
        else:
            sigma = spectral_sigma_exact(w)
        return apply_fn(w / sigma, *args)


class SpectralEqualConv2d(nn.Module):
    """EqualConv2d with spectral weight normalization — the reference's
    ``SpectralNorm(EqualConv2d(...))`` used by ConvLayer's 'sp' activation
    (layers.py:357-364). NHWC/HWIO; power-iteration state in 'spectral'."""

    out_channel: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    power_iterations: int = 1
    eps: float = 1e-8

    @nn.compact
    def __call__(self, x):
        import math

        from jax import lax

        in_channel = x.shape[-1]
        k = self.kernel_size
        # torch layout puts out_channel first for the power iteration;
        # store OIHW-shaped bar weight and transpose for the conv
        w_bar = self.param(
            "weight_bar", nn.initializers.normal(stddev=1.0),
            (self.out_channel, in_channel, k, k),
        )
        height = self.out_channel
        width = in_channel * k * k
        w2d = w_bar.reshape(height, width)
        if self.power_iterations > 0:
            u = self.variable(
                "spectral", "u",
                lambda: normalize_vec(
                    jax.random.normal(self.make_rng("params"), (height,))
                ),
            )
            v = self.variable(
                "spectral", "v",
                lambda: normalize_vec(
                    jax.random.normal(self.make_rng("params"), (width,))
                ),
            )
            uv, vv = u.value, v.value
            for _ in range(self.power_iterations):
                vv = normalize_vec(w2d.T @ uv, eps=self.eps)
                uv = normalize_vec(w2d @ vv, eps=self.eps)
            uv = jax.lax.stop_gradient(uv)
            vv = jax.lax.stop_gradient(vv)
            if not self.is_initializing():
                u.value = uv
                v.value = vv
            sigma = uv @ (w2d @ vv)
        else:
            sigma = spectral_sigma_exact(w_bar)
        w = (w_bar / sigma).transpose(2, 3, 1, 0)  # -> HWIO
        scale = 1.0 / math.sqrt(in_channel * k * k)
        y = lax.conv_general_dilated(
            x, (w * scale).astype(x.dtype),
            window_strides=(self.stride, self.stride),
            padding=((self.padding, self.padding), (self.padding, self.padding)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.out_channel,))
            y = y + b.astype(y.dtype)
        return y
