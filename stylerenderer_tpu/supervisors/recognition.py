"""InceptionResnetV1 face-recognition embedding (the reference's ``feat``
supervisor, thirdparty/facenet-pytorch, train.py:523-526).

flax/NHWC port of the facenet architecture: stem, 5x Block35, reduction-A,
10x Block17, reduction-B, 5x Block8, pooled 512-d embedding, L2-normalized.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class ConvBN(nn.Module):
    features: int
    kernel: tuple = (3, 3)
    strides: tuple = (1, 1)
    padding: int | tuple = 0

    @nn.compact
    def __call__(self, x):
        pad = self.padding
        if isinstance(pad, int):
            pad = ((pad, pad), (pad, pad))
        x = nn.Conv(self.features, self.kernel, self.strides, padding=pad,
                    use_bias=False, name="conv")(x)
        c = self.features
        scale = self.param("bn_scale", nn.initializers.ones, (c,))
        bias = self.param("bn_bias", nn.initializers.zeros, (c,))
        mean = self.param("bn_mean", nn.initializers.zeros, (c,))
        var = self.param("bn_var", nn.initializers.ones, (c,))
        x = (x - mean) * jax.lax.rsqrt(var + 1e-3) * scale + bias
        return jax.nn.relu(x)


def _maxpool3s2(x):
    return nn.max_pool(x, (3, 3), (2, 2))


class Block35(nn.Module):
    scale: float = 0.17

    @nn.compact
    def __call__(self, x):
        b0 = ConvBN(32, (1, 1), name="b0")(x)
        b1 = ConvBN(32, (1, 1), name="b1_0")(x)
        b1 = ConvBN(32, (3, 3), padding=1, name="b1_1")(b1)
        b2 = ConvBN(32, (1, 1), name="b2_0")(x)
        b2 = ConvBN(32, (3, 3), padding=1, name="b2_1")(b2)
        b2 = ConvBN(32, (3, 3), padding=1, name="b2_2")(b2)
        up = nn.Conv(x.shape[-1], (1, 1), name="up")(
            jnp.concatenate([b0, b1, b2], -1)
        )
        return jax.nn.relu(x + self.scale * up)


class Block17(nn.Module):
    scale: float = 0.10

    @nn.compact
    def __call__(self, x):
        b0 = ConvBN(128, (1, 1), name="b0")(x)
        b1 = ConvBN(128, (1, 1), name="b1_0")(x)
        b1 = ConvBN(128, (1, 7), padding=(0, 3), name="b1_1")(b1)
        b1 = ConvBN(128, (7, 1), padding=(3, 0), name="b1_2")(b1)
        up = nn.Conv(x.shape[-1], (1, 1), name="up")(
            jnp.concatenate([b0, b1], -1)
        )
        return jax.nn.relu(x + self.scale * up)


class Block8(nn.Module):
    scale: float = 0.20
    activate: bool = True

    @nn.compact
    def __call__(self, x):
        b0 = ConvBN(192, (1, 1), name="b0")(x)
        b1 = ConvBN(192, (1, 1), name="b1_0")(x)
        b1 = ConvBN(192, (1, 3), padding=(0, 1), name="b1_1")(b1)
        b1 = ConvBN(192, (3, 1), padding=(1, 0), name="b1_2")(b1)
        up = nn.Conv(x.shape[-1], (1, 1), name="up")(
            jnp.concatenate([b0, b1], -1)
        )
        y = x + self.scale * up
        return jax.nn.relu(y) if self.activate else y


class InceptionResnetV1(nn.Module):
    """image [B,S,S,3] in [-1,1] -> L2-normalized embedding [B, 512]."""

    emb_dim: int = 512

    @nn.compact
    def __call__(self, x):
        x = ConvBN(32, (3, 3), (2, 2), name="conv2d_1a")(x)
        x = ConvBN(32, (3, 3), name="conv2d_2a")(x)
        x = ConvBN(64, (3, 3), padding=1, name="conv2d_2b")(x)
        x = _maxpool3s2(x)
        x = ConvBN(80, (1, 1), name="conv2d_3b")(x)
        x = ConvBN(192, (3, 3), name="conv2d_4a")(x)
        x = ConvBN(256, (3, 3), (2, 2), name="conv2d_4b")(x)
        for i in range(5):
            x = Block35(name=f"repeat_1_{i}")(x)
        # reduction A
        r0 = ConvBN(384, (3, 3), (2, 2), name="mixed_6a_b0")(x)
        r1 = ConvBN(192, (1, 1), name="mixed_6a_b1_0")(x)
        r1 = ConvBN(192, (3, 3), padding=1, name="mixed_6a_b1_1")(r1)
        r1 = ConvBN(256, (3, 3), (2, 2), name="mixed_6a_b1_2")(r1)
        x = jnp.concatenate([r0, r1, _maxpool3s2(x)], -1)
        for i in range(10):
            x = Block17(name=f"repeat_2_{i}")(x)
        # reduction B
        r0 = ConvBN(256, (1, 1), name="mixed_7a_b0_0")(x)
        r0 = ConvBN(384, (3, 3), (2, 2), name="mixed_7a_b0_1")(r0)
        r1 = ConvBN(256, (1, 1), name="mixed_7a_b1_0")(x)
        r1 = ConvBN(256, (3, 3), (2, 2), name="mixed_7a_b1_1")(r1)
        r2 = ConvBN(256, (1, 1), name="mixed_7a_b2_0")(x)
        r2 = ConvBN(256, (3, 3), padding=1, name="mixed_7a_b2_1")(r2)
        r2 = ConvBN(256, (3, 3), (2, 2), name="mixed_7a_b2_2")(r2)
        x = jnp.concatenate([r0, r1, r2, _maxpool3s2(x)], -1)
        for i in range(5):
            x = Block8(name=f"repeat_3_{i}")(x)
        x = Block8(activate=False, name="block8")(x)
        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dense(self.emb_dim, use_bias=False, name="last_linear")(x)
        # final BN (facenet last_bn), inference form
        scale = self.param("last_bn_scale", nn.initializers.ones, (self.emb_dim,))
        bias = self.param("last_bn_bias", nn.initializers.zeros, (self.emb_dim,))
        mean = self.param("last_bn_mean", nn.initializers.zeros, (self.emb_dim,))
        var = self.param("last_bn_var", nn.initializers.ones, (self.emb_dim,))
        x = (x - mean) * jax.lax.rsqrt(var + 1e-3) * scale + bias
        return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-8)
