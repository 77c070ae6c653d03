"""FID InceptionV3 — flax/NHWC port of the FID-standard network.

Architecture matches the pt_inception-2015-12-05 network used by the
reference (``/root/reference/inception.py``; the mseitzer/pytorch-fid port of
the original TF-slim graph), including the FID-specific patches:

- InceptionA/C/E average-pool branches use ``count_include_pad=False``;
- the last InceptionE block uses a max-pool branch instead of avg-pool;
- inputs are bilinearly resized to 299x299; ``normalize_input=False`` (the
  reference feeds [-1, 1] images directly, calc_inception.py:53).

Weights: the published checkpoint can't be downloaded in this offline image.
``load_torch_inception_weights`` converts a locally-provided torch state
dict (either the FID checkpoint or torchvision inception_v3); without one,
``init`` gives a fixed-seed random network — FID values are then
self-consistent (usable for relative comparisons / tests) but NOT comparable
to published numbers. Pass ``weights_path`` wherever FID parity matters.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class BasicConv2d(nn.Module):
    """conv(no bias) + BN(eps=1e-3, inference) + relu."""

    out_channels: int
    kernel_size: tuple[int, int]
    strides: tuple[int, int] = (1, 1)
    padding: Any = (0, 0)

    @nn.compact
    def __call__(self, x):
        pad = self.padding
        if isinstance(pad, int):
            pad = (pad, pad)
        if isinstance(pad, tuple) and len(pad) == 2 and isinstance(pad[0], int):
            pad = ((pad[0], pad[0]), (pad[1], pad[1]))
        x = nn.Conv(
            self.out_channels, self.kernel_size, self.strides, padding=pad,
            use_bias=False, name="conv",
        )(x)
        # inference batch-norm with stored statistics
        c = self.out_channels
        scale = self.param("bn_scale", nn.initializers.ones, (c,))
        bias = self.param("bn_bias", nn.initializers.zeros, (c,))
        mean = self.param("bn_mean", nn.initializers.zeros, (c,))
        var = self.param("bn_var", nn.initializers.ones, (c,))
        x = (x - mean) * jax.lax.rsqrt(var + 1e-3) * scale + bias
        return jax.nn.relu(x)


def _avgpool3(x, count_include_pad: bool):
    """3x3 stride-1 avg pool, pad 1. FID patch: count_include_pad=False."""
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)),
    )
    if count_include_pad:
        return s / 9.0
    ones = jnp.ones_like(x[..., :1])
    cnt = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)),
    )
    return s / cnt


def _maxpool(x, window=3, stride=2):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, window, window, 1), (1, stride, stride, 1),
        "VALID",
    )


class InceptionA(nn.Module):
    pool_features: int
    fid: bool = True

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=2, name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=1, name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=1, name="branch3x3dbl_3")(b3)
        bp = _avgpool3(x, count_include_pad=not self.fid)
        bp = BasicConv2d(self.pool_features, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], -1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), (2, 2), name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=1, name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), (2, 2), name="branch3x3dbl_3")(bd)
        bp = _maxpool(x)
        return jnp.concatenate([b3, bd, bp], -1)


class InceptionC(nn.Module):
    channels_7x7: int
    fid: bool = True

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = BasicConv2d(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7dbl_5")(bd)
        bp = _avgpool3(x, count_include_pad=not self.fid)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], -1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), (2, 2), name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), (2, 2), name="branch7x7x3_4")(b7)
        bp = _maxpool(x)
        return jnp.concatenate([b3, b7, bp], -1)


class InceptionE(nn.Module):
    pool: str = "avg"  # FID: last block uses 'max'
    fid: bool = True

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1")(x)
        b3 = jnp.concatenate(
            [
                BasicConv2d(384, (1, 3), padding=(0, 1), name="branch3x3_2a")(b3),
                BasicConv2d(384, (3, 1), padding=(1, 0), name="branch3x3_2b")(b3),
            ],
            -1,
        )
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=1, name="branch3x3dbl_2")(bd)
        bd = jnp.concatenate(
            [
                BasicConv2d(384, (1, 3), padding=(0, 1), name="branch3x3dbl_3a")(bd),
                BasicConv2d(384, (3, 1), padding=(1, 0), name="branch3x3dbl_3b")(bd),
            ],
            -1,
        )
        if self.pool == "max":
            bp = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 1, 1, 1),
                ((0, 0), (1, 1), (1, 1), (0, 0)),
            )
        else:
            bp = _avgpool3(x, count_include_pad=not self.fid)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], -1)


class InceptionV3(nn.Module):
    """FID feature extractor: images [B,H,W,3] in [-1,1] -> pool3 [B, 2048]."""

    resize_input: bool = True
    normalize_input: bool = False  # reference calc_inception.py:53
    fid: bool = True

    @nn.compact
    def __call__(self, x):
        if self.resize_input:
            x = jax.image.resize(x, (x.shape[0], 299, 299, 3), "bilinear")
        if self.normalize_input:
            x = 2 * x - 1
        x = BasicConv2d(32, (3, 3), (2, 2), name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=1, name="Conv2d_2b_3x3")(x)
        x = _maxpool(x)
        x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = _maxpool(x)
        x = InceptionA(32, self.fid, name="Mixed_5b")(x)
        x = InceptionA(64, self.fid, name="Mixed_5c")(x)
        x = InceptionA(64, self.fid, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, self.fid, name="Mixed_6b")(x)
        x = InceptionC(160, self.fid, name="Mixed_6c")(x)
        x = InceptionC(160, self.fid, name="Mixed_6d")(x)
        x = InceptionC(192, self.fid, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE("avg", self.fid, name="Mixed_7b")(x)
        x = InceptionE("max" if self.fid else "avg", self.fid, name="Mixed_7c")(x)
        return jnp.mean(x, axis=(1, 2))  # global avg pool -> [B, 2048]


def load_patched_inception_v3(weights_path: str | None = None, rng=None):
    """(model, params). With ``weights_path`` (a torch state dict of the FID
    inception / torchvision inception_v3), weights are converted; otherwise a
    fixed-seed random network is returned (see module docstring)."""
    model = InceptionV3()
    if rng is None:
        rng = jax.random.PRNGKey(0)
    params = model.init(rng, jnp.zeros((1, 64, 64, 3)))["params"]
    if weights_path:
        params = load_torch_inception_weights(weights_path, params)
    else:
        # random-feature mode: flax's default lecun init loses half the
        # variance through every conv+relu, so 90+ layers collapse all
        # inputs to one point (FID identically 0). He gain (x sqrt 2 per
        # conv kernel) preserves signal, making random-feature FID
        # discriminative (self-consistent trends, still not comparable to
        # published numbers — see module docstring).
        import numpy as np

        def he(path, x):
            if path[-1].key == "kernel":
                return x * np.sqrt(2.0)
            return x

        params = jax.tree_util.tree_map_with_path(he, params)
    return model, params


def load_torch_inception_weights(path: str, params):
    """Convert a torch Inception state dict into the flax param tree."""
    import numpy as np
    import torch

    sd = torch.load(path, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()

    def basic(prefix):
        return {
            "conv": {
                "kernel": np.transpose(
                    sd[prefix + ".conv.weight"].numpy(), (2, 3, 1, 0)
                )
            },
            "bn_scale": sd[prefix + ".bn.weight"].numpy(),
            "bn_bias": sd[prefix + ".bn.bias"].numpy(),
            "bn_mean": sd[prefix + ".bn.running_mean"].numpy(),
            "bn_var": sd[prefix + ".bn.running_var"].numpy(),
        }

    new = {}
    for top, sub in params.items():
        if top.startswith("Conv2d"):
            new[top] = basic(top)
        else:  # Mixed_* blocks: each child is a BasicConv2d
            new[top] = {
                child: basic(f"{top}.{child}") for child in sub.keys()
            }
    return jax.tree_util.tree_map(jnp.asarray, new)
