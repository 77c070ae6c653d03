"""PFLD landmark regressor (the reference's ``lmk`` supervisor,
thirdparty/pytorch_face_landmark pfld_compressed, train.py:513-519).

MobileNet-v2-style inverted-residual backbone with the PFLD multi-scale
head: image [B,S,S,3] -> normalized landmarks [B, 2*n_points] in [0,1].
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class _BN(nn.Module):
    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        mean = self.param("mean", nn.initializers.zeros, (c,))
        var = self.param("var", nn.initializers.ones, (c,))
        return (x - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bias


class InvertedResidual(nn.Module):
    features: int
    strides: int = 1
    expand: int = 2

    @nn.compact
    def __call__(self, x):
        inp = x.shape[-1]
        hidden = inp * self.expand
        y = nn.Conv(hidden, (1, 1), use_bias=False, name="pw")(x)
        y = jax.nn.relu(_BN(name="bn1")(y))
        y = nn.Conv(hidden, (3, 3), (self.strides, self.strides), padding=1,
                    feature_group_count=hidden, use_bias=False, name="dw")(y)
        y = jax.nn.relu(_BN(name="bn2")(y))
        y = nn.Conv(self.features, (1, 1), use_bias=False, name="pw2")(y)
        y = _BN(name="bn3")(y)
        if self.strides == 1 and inp == self.features:
            y = y + x
        return y


class PFLDInference(nn.Module):
    n_points: int = 68

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(64, (3, 3), (2, 2), padding=1, use_bias=False, name="c1")(x)
        y = jax.nn.relu(_BN(name="b1")(y))
        y = nn.Conv(64, (3, 3), padding=1, feature_group_count=64,
                    use_bias=False, name="c2")(y)
        y = jax.nn.relu(_BN(name="b2")(y))
        y = InvertedResidual(64, 2, name="ir1")(y)
        for i in range(4):
            y = InvertedResidual(64, 1, name=f"ir2_{i}")(y)
        y = InvertedResidual(128, 2, name="ir3")(y)
        for i in range(6):
            y = InvertedResidual(128, 1, name=f"ir4_{i}")(y)
        y = InvertedResidual(16, 1, name="ir5")(y)
        # multi-scale head: global features at three scales
        s1 = jnp.mean(y, axis=(1, 2))
        y2 = nn.Conv(32, (3, 3), (2, 2), padding=1, use_bias=False, name="c3")(y)
        y2 = jax.nn.relu(_BN(name="b3")(y2))
        s2 = jnp.mean(y2, axis=(1, 2))
        y3 = nn.Conv(128, (7, 7), (1, 1), padding=0, use_bias=False, name="c4")(
            y2
        ) if y2.shape[1] >= 7 else nn.Conv(128, (3, 3), padding=1,
                                           use_bias=False, name="c4b")(y2)
        y3 = jax.nn.relu(_BN(name="b4")(y3))
        s3 = jnp.mean(y3, axis=(1, 2))
        feat = jnp.concatenate([s1, s2, s3], -1)
        return nn.Dense(2 * self.n_points, name="fc")(feat)
