"""Regressor — image-to-latent encoder for Render Inverting.

Intended semantics of reference ``model.py:337-387`` (that code contains two
latent bugs: ``self.convs[2*i]`` double-steps an already-even loop index, and
``ConvLayer(3, out//2)`` omits the required kernel-size argument; we implement
the evident intent: per-scale feature extraction with RGB re-injection via 1x1
from_rgb convs, accumulating per-scale mean/variance statistics, finished by
an n_mlp equalized-linear stack + PixelNorm producing a style vector).
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from stylerenderer_tpu.models.generator import channel_table
from stylerenderer_tpu.nn.layers import ConvLayer, EqualLinear, PixelNorm


class Regressor(nn.Module):
    size: int
    style_dim: int = 512
    n_mlp: int = 8
    channel_multiplier: int = 2
    blur_kernel: Sequence[int] = (1, 3, 3, 1)
    lr_mlp: float = 0.01
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, rgb):
        ch = channel_table(self.channel_multiplier)
        log_size = int(math.log2(self.size))
        rgb = rgb.astype(self.dtype)
        out = ConvLayer(ch[self.size], 1, dtype=self.dtype, name="conv1")(rgb)

        def stats(t):
            # per-channel spatial mean + variance (torch .var is unbiased)
            m = jnp.mean(t, axis=(1, 2))
            v = jnp.var(t, axis=(1, 2), ddof=1)
            return [m, v]

        latents = stats(out)
        for idx, i in enumerate(range(log_size, 2, -1)):
            out_channel = ch[2**i]
            out = ConvLayer(
                out_channel // 2, 3, dtype=self.dtype, name=f"conv{idx}_a"
            )(out)
            rgb_feat = ConvLayer(
                out_channel // 2, 1, dtype=self.dtype, name=f"from_rgb{idx}"
            )(rgb)
            out = jnp.concatenate([out, rgb_feat], axis=-1)
            out = ConvLayer(
                out_channel, 3, downsample=True, blur_kernel=self.blur_kernel,
                dtype=self.dtype, name=f"conv{idx}_b",
            )(out)
            rgb = jax.image.resize(
                rgb, (rgb.shape[0], out.shape[1], out.shape[2], rgb.shape[3]),
                "linear",
            )
            latents += stats(out)
        latents.append(out.reshape(out.shape[0], -1))
        latents = jnp.concatenate(latents, axis=-1)

        w = EqualLinear(
            self.style_dim, lr_mul=self.lr_mlp, activation="fused_lrelu", name="fc0"
        )(latents)
        for i in range(1, self.n_mlp):
            w = EqualLinear(
                self.style_dim, lr_mul=self.lr_mlp, activation="fused_lrelu",
                name=f"fc{i}",
            )(w)
        return PixelNorm()(w)
