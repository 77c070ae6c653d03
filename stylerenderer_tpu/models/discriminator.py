"""StyleGAN2 Discriminator (reference ``model.py:296-336``), NHWC."""

from __future__ import annotations

import math
from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from stylerenderer_tpu.models.generator import channel_table
from stylerenderer_tpu.nn.layers import ConvLayer, EqualLinear, ResBlock, minibatch_stddev


class Discriminator(nn.Module):
    size: int
    channel_multiplier: int = 2
    blur_kernel: Sequence[int] = (1, 3, 3, 1)
    stddev_group: int = 4
    stddev_feat: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        ch = channel_table(self.channel_multiplier)
        log_size = int(math.log2(self.size))
        out = ConvLayer(ch[self.size], 1, dtype=self.dtype, name="from_rgb")(
            x.astype(self.dtype)
        )
        for i in range(log_size, 2, -1):
            out = ResBlock(
                ch[2 ** (i - 1)], self.blur_kernel, dtype=self.dtype,
                name=f"block{i}",
            )(out)
        out = minibatch_stddev(out, self.stddev_group, self.stddev_feat)
        out = ConvLayer(ch[4], 3, dtype=self.dtype, name="final_conv")(out)
        out = out.reshape(out.shape[0], -1)
        out = EqualLinear(ch[4], activation="fused_lrelu", name="final_linear0")(out)
        out = EqualLinear(1, name="final_linear1")(out)
        return out
