"""PFLD landmark regressor (the reference's ``lmk`` supervisor,
train.py:513-519: ``<lmk_net>.PFLDInference()`` +
``checkpoint/pfld_model_best.pth.tar['state_dict']`` from the
pytorch_face_landmark submodule, whose ``models/pfld_compressed.py`` is the
standard PFLD-pytorch network).

flax/NHWC port with the published layout — MobileNet-v2 inverted residuals
(expansion 2 for the 64-ch stage, 4 for the 128-ch stage), three-scale head
(16-ch map, 32-ch stride-2 map, 128-ch 7x7-conv map, each globally pooled),
fc to 2*68 landmarks in [0, 1] of the 112px crop. State dicts convert via
``supervisors/convert.py::convert_pfld``.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class BN(nn.Module):
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        mean = self.param("mean", nn.initializers.zeros, (c,))
        var = self.param("var", nn.initializers.ones, (c,))
        return (x - mean) * jax.lax.rsqrt(var + self.eps) * scale + bias


class InvertedResidual(nn.Module):
    """PFLD-pytorch InvertedResidual: pw-expand/bn/relu, dw/bn/relu,
    pw-linear/bn (+ skip when stride 1 and shapes match and
    ``use_res_connect``). Sequential indices 0..7 in the torch state dict."""

    features: int
    strides: int = 1
    use_res_connect: bool = True
    expand: int = 2

    @nn.compact
    def __call__(self, x):
        hidden = x.shape[-1] * self.expand
        y = nn.Conv(hidden, (1, 1), use_bias=False, name="pw")(x)
        y = jax.nn.relu(BN(name="bn1")(y))
        y = nn.Conv(hidden, (3, 3), (self.strides, self.strides), padding=1,
                    feature_group_count=hidden, use_bias=False, name="dw")(y)
        y = jax.nn.relu(BN(name="bn2")(y))
        y = nn.Conv(self.features, (1, 1), use_bias=False, name="pw2")(y)
        y = BN(name="bn3")(y)
        if self.use_res_connect and self.strides == 1 and \
                x.shape[-1] == self.features:
            y = y + x
        return y


class PFLDInference(nn.Module):
    """image [B,112,112,3] in [0,1] -> landmarks [B, 2*n_points]."""

    n_points: int = 68

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(64, (3, 3), (2, 2), padding=1, use_bias=False,
                    name="conv1")(x)
        y = jax.nn.relu(BN(name="bn1")(y))
        y = nn.Conv(64, (3, 3), padding=1, feature_group_count=64,
                    use_bias=False, name="conv2")(y)
        y = jax.nn.relu(BN(name="bn2")(y))
        y = InvertedResidual(64, 2, False, 2, name="conv3_1")(y)
        for i in range(2, 6):
            y = InvertedResidual(64, 1, True, 2, name=f"block3_{i}")(y)
        y = InvertedResidual(128, 2, False, 2, name="conv4_1")(y)
        y = InvertedResidual(128, 1, False, 4, name="conv5_1")(y)
        for i in range(2, 7):
            y = InvertedResidual(128, 1, True, 4, name=f"block5_{i}")(y)
        y = InvertedResidual(16, 1, False, 2, name="conv6_1")(y)  # [B,14,14,16]
        s1 = jnp.mean(y, axis=(1, 2))  # avg_pool1(14)
        # conv7 is a conv_bn block (conv/bn/relu) in the published net
        y = nn.Conv(32, (3, 3), (2, 2), padding=1, use_bias=False,
                    name="conv7")(y)  # 7x7x32
        y = jax.nn.relu(BN(name="bn7")(y))
        s2 = jnp.mean(y, axis=(1, 2))  # avg_pool2(7)
        y = jax.nn.relu(nn.Conv(128, (7, 7), padding=0, name="conv8")(y))
        s3 = y.reshape(y.shape[0], -1)  # [B, 128] (1x1 spatial)
        feat = jnp.concatenate([s1, s2, s3], -1)  # [B, 176]
        return nn.Dense(2 * self.n_points, name="fc")(feat)
