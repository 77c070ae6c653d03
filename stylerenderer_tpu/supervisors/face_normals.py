"""Shape-from-shading normal estimator: ResNet18-encoder UNet.

The reference's ``sfs`` supervisor (thirdparty/face_normals ResNetUNet,
train.py:504-509): image -> per-pixel unit normal map. flax/NHWC port with a
torchvision-resnet18-style encoder so published encoder weights convert.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class BNRelu(nn.Module):
    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("bn_scale", nn.initializers.ones, (c,))
        bias = self.param("bn_bias", nn.initializers.zeros, (c,))
        mean = self.param("bn_mean", nn.initializers.zeros, (c,))
        var = self.param("bn_var", nn.initializers.ones, (c,))
        x = (x - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bias
        return jax.nn.relu(x)


class BasicBlock(nn.Module):
    features: int
    strides: int = 1

    @nn.compact
    def __call__(self, x):
        residual = x
        y = nn.Conv(self.features, (3, 3), (self.strides, self.strides),
                    padding=1, use_bias=False, name="conv1")(x)
        y = BNRelu(name="bn1")(y)
        y = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                    name="conv2")(y)
        c = self.features
        scale = self.param("bn2_scale", nn.initializers.ones, (c,))
        bias = self.param("bn2_bias", nn.initializers.zeros, (c,))
        mean = self.param("bn2_mean", nn.initializers.zeros, (c,))
        var = self.param("bn2_var", nn.initializers.ones, (c,))
        y = (y - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bias
        if residual.shape != y.shape:
            residual = nn.Conv(self.features, (1, 1),
                               (self.strides, self.strides), use_bias=False,
                               name="down")(x)
        return jax.nn.relu(y + residual)


class ResNetUNet(nn.Module):
    """image [B,H,W,3] in [-1,1] -> (normals [B,H,W,3] unit, confidence)."""

    n_class: int = 3
    widths: Sequence[int] = (64, 64, 128, 256, 512)

    @nn.compact
    def __call__(self, x):
        w = self.widths
        # encoder (resnet18 layout)
        e0 = nn.Conv(w[0], (7, 7), (2, 2), padding=3, use_bias=False,
                     name="stem")(x)
        e0 = BNRelu(name="stem_bn")(e0)
        p0 = nn.max_pool(e0, (3, 3), (2, 2), padding=((1, 1), (1, 1)))
        e1 = BasicBlock(w[1], name="layer1_0")(p0)
        e1 = BasicBlock(w[1], name="layer1_1")(e1)
        e2 = BasicBlock(w[2], 2, name="layer2_0")(e1)
        e2 = BasicBlock(w[2], name="layer2_1")(e2)
        e3 = BasicBlock(w[3], 2, name="layer3_0")(e2)
        e3 = BasicBlock(w[3], name="layer3_1")(e3)
        e4 = BasicBlock(w[4], 2, name="layer4_0")(e3)
        e4 = BasicBlock(w[4], name="layer4_1")(e4)

        def up(t, like):
            return jax.image.resize(
                t, (t.shape[0], like.shape[1], like.shape[2], t.shape[-1]),
                "bilinear",
            )

        # decoder with skip connections
        d3 = nn.Conv(w[3], (3, 3), padding=1, name="dec3")(
            jnp.concatenate([up(e4, e3), e3], -1)
        )
        d3 = jax.nn.relu(d3)
        d2 = nn.Conv(w[2], (3, 3), padding=1, name="dec2")(
            jnp.concatenate([up(d3, e2), e2], -1)
        )
        d2 = jax.nn.relu(d2)
        d1 = nn.Conv(w[1], (3, 3), padding=1, name="dec1")(
            jnp.concatenate([up(d2, e1), e1], -1)
        )
        d1 = jax.nn.relu(d1)
        d0 = nn.Conv(w[0], (3, 3), padding=1, name="dec0")(
            jnp.concatenate([up(d1, e0), e0], -1)
        )
        d0 = jax.nn.relu(d0)
        out = nn.Conv(self.n_class, (3, 3), padding=1, name="head")(
            up(d0, x)
        )
        # unit-normalize the normal prediction
        n = out / jnp.maximum(
            jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-6
        )
        return n, out
