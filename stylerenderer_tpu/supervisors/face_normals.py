"""Shape-from-shading normal estimator: ResNet18-encoder UNet.

The reference's ``sfs`` supervisor (train.py:504-509) imports
``<sfs_net>.ResNetUNet(n_class=3)`` from the (empty-in-checkout)
``thirdparty/face_normals`` submodule and loads ``data/model.pth``. The
``ResNetUNet(n_class)`` signature and checkpoint layout match the standard
resnet18-encoder UNet (torchvision resnet18 trunk + 1x1 laterals + bilinear
align_corners=True 2x upsampling + full-resolution skip branch); this module
is a flax/NHWC port of that layout so the published ``model.pth`` state dict
converts key-for-key (``supervisors/convert.py::convert_face_normals``).

Output: ``(normals, raw)`` — train.py:317 consumes ``model(img)[0]`` and
smooth-L1s it against the rasterized normal map, masked to the face region.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class BN(nn.Module):
    """Inference batch-norm with stored statistics (torch BN eps=1e-5)."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        mean = self.param("mean", nn.initializers.zeros, (c,))
        var = self.param("var", nn.initializers.ones, (c,))
        return (x - mean) * jax.lax.rsqrt(var + self.eps) * scale + bias


class BasicBlock(nn.Module):
    """torchvision resnet18 BasicBlock (conv1/bn1/relu/conv2/bn2 + skip)."""

    features: int
    strides: int = 1

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.features, (3, 3), (self.strides, self.strides),
                    padding=1, use_bias=False, name="conv1")(x)
        y = jax.nn.relu(BN(name="bn1")(y))
        y = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                    name="conv2")(y)
        y = BN(name="bn2")(y)
        if self.strides != 1 or x.shape[-1] != self.features:
            x = nn.Conv(self.features, (1, 1),
                        (self.strides, self.strides), use_bias=False,
                        name="down_conv")(x)
            x = BN(name="down_bn")(x)
        return jax.nn.relu(y + x)


def _upsample2x_align_corners(x):
    """Bilinear 2x upsample with ``align_corners=True`` (torch
    nn.Upsample(scale_factor=2, mode='bilinear', align_corners=True)):
    output grid position i samples input coordinate ``i*(n-1)/(2n-1)``.

    jax.image.resize only offers half-pixel (align_corners=False) sampling,
    so the interpolation is applied as two static separable matrices — an
    MXU matmul per axis instead of gathers (gathers run ~2 GB/s on this
    chip)."""
    B, H, W, C = x.shape

    def mat(n):
        m = np.zeros((2 * n, n), np.float32)
        if n == 1:
            m[:, 0] = 1.0
            return m
        for i in range(2 * n):
            p = i * (n - 1) / (2 * n - 1)
            lo = int(np.floor(p))
            hi = min(lo + 1, n - 1)
            f = p - lo
            m[i, lo] += 1.0 - f
            m[i, hi] += f
        return m

    mh = jnp.asarray(mat(H))
    mw = jnp.asarray(mat(W))
    x = jnp.einsum("bhwc,gh->bgwc", x, mh)
    x = jnp.einsum("bhwc,gw->bhgc", x, mw)
    return x


def _convrelu(x, features, kernel, padding, name):
    """convrelu(in, out, k, p) = Conv2d(+bias) + ReLU."""
    y = nn.Conv(features, (kernel, kernel), padding=padding, name=name)(x)
    return jax.nn.relu(y)


class ResNetUNet(nn.Module):
    """image [B,H,W,3] -> (normals [B,H,W,3] unit, raw logits)."""

    n_class: int = 3

    @nn.compact
    def __call__(self, x):
        x_original = _convrelu(x, 64, 3, 1, "conv_original_size0")
        x_original = _convrelu(x_original, 64, 3, 1, "conv_original_size1")

        # resnet18 encoder (torchvision layout/names)
        l0 = nn.Conv(64, (7, 7), (2, 2), padding=3, use_bias=False,
                     name="conv1")(x)
        l0 = jax.nn.relu(BN(name="bn1")(l0))
        p = nn.max_pool(l0, (3, 3), (2, 2), padding=((1, 1), (1, 1)))
        l1 = BasicBlock(64, name="layer1_0")(p)
        l1 = BasicBlock(64, name="layer1_1")(l1)
        l2 = BasicBlock(128, 2, name="layer2_0")(l1)
        l2 = BasicBlock(128, name="layer2_1")(l2)
        l3 = BasicBlock(256, 2, name="layer3_0")(l2)
        l3 = BasicBlock(256, name="layer3_1")(l3)
        l4 = BasicBlock(512, 2, name="layer4_0")(l3)
        l4 = BasicBlock(512, name="layer4_1")(l4)

        # 1x1 laterals + decoder
        l4 = _convrelu(l4, 512, 1, 0, "layer4_1x1")
        y = _upsample2x_align_corners(l4)
        l3 = _convrelu(l3, 256, 1, 0, "layer3_1x1")
        y = _convrelu(jnp.concatenate([y, l3], -1), 512, 3, 1, "conv_up3")
        y = _upsample2x_align_corners(y)
        l2 = _convrelu(l2, 128, 1, 0, "layer2_1x1")
        y = _convrelu(jnp.concatenate([y, l2], -1), 256, 3, 1, "conv_up2")
        y = _upsample2x_align_corners(y)
        l1 = _convrelu(l1, 64, 1, 0, "layer1_1x1")
        y = _convrelu(jnp.concatenate([y, l1], -1), 256, 3, 1, "conv_up1")
        y = _upsample2x_align_corners(y)
        l0 = _convrelu(l0, 64, 1, 0, "layer0_1x1")
        y = _convrelu(jnp.concatenate([y, l0], -1), 128, 3, 1, "conv_up0")
        y = _upsample2x_align_corners(y)
        y = _convrelu(jnp.concatenate([y, x_original], -1), 64, 3, 1,
                      "conv_original_size2")
        out = nn.Conv(self.n_class, (1, 1), name="conv_last")(y)

        # unit-normalize the normal prediction (clamp inside the sqrt so
        # the gradient is finite at exactly-zero vectors)
        n2 = jnp.sum(out * out, axis=-1, keepdims=True)
        n = out / jnp.sqrt(jnp.maximum(n2, 1e-12))
        return n, out
