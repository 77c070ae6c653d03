"""LPIPS perceptual distance (net-lin, vgg/alex) — flax/NHWC port.

Reference: the vendored richzhang LPIPS in ``/root/reference/lpips/``
(``networks_basic.py:64-92`` PNetLin): per-layer unit-normalized feature
differences squared -> non-negative 1x1 linear head -> spatial average ->
sum over layers; inputs in [-1, 1] are shifted/scaled by the ImageNet-ish
constants before the backbone.

Weights: the published 1x1 linear heads ship with the reference
(``lpips/weights/v0.1/{vgg,alex}.pth`` — small data files) and are loaded
when available. The VGG16/AlexNet *backbone* weights (torchvision) cannot be
downloaded in this offline image; ``load_lpips`` accepts a local torchvision
state dict, else falls back to a fixed-seed random backbone (self-consistent
distances for smoke tests, NOT the published metric — pass real weights for
PPL parity).
"""

from __future__ import annotations

import os
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# input scaling (lpips networks_basic.py ScalingLayer constants)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

VGG16_CFG = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M",
             512, 512, 512)
# slice boundaries: relu1_2, relu2_2, relu3_3, relu4_3, relu5_3
VGG_SLICES = (2, 4, 7, 10, 13)  # conv counts after which features are tapped
VGG_CHANNELS = (64, 128, 256, 512, 512)

ALEX_CHANNELS = (64, 192, 384, 256, 256)


class VGG16Features(nn.Module):
    """VGG16 conv trunk emitting the 5 LPIPS taps."""

    @nn.compact
    def __call__(self, x):
        taps = []
        conv_i = 0
        for v in VGG16_CFG:
            if v == "M":
                x = nn.max_pool(x, (2, 2), (2, 2))
            else:
                x = nn.Conv(v, (3, 3), padding=1, name=f"conv{conv_i}")(x)
                x = jax.nn.relu(x)
                conv_i += 1
                if conv_i in VGG_SLICES:
                    taps.append(x)
        return taps


class AlexNetFeatures(nn.Module):
    """AlexNet conv trunk emitting the 5 LPIPS taps."""

    @nn.compact
    def __call__(self, x):
        taps = []
        x = nn.Conv(64, (11, 11), (4, 4), padding=2, name="conv0")(x)
        x = jax.nn.relu(x)
        taps.append(x)
        x = nn.max_pool(x, (3, 3), (2, 2))
        x = nn.Conv(192, (5, 5), padding=2, name="conv1")(x)
        x = jax.nn.relu(x)
        taps.append(x)
        x = nn.max_pool(x, (3, 3), (2, 2))
        x = nn.Conv(384, (3, 3), padding=1, name="conv2")(x)
        x = jax.nn.relu(x)
        taps.append(x)
        x = nn.Conv(256, (3, 3), padding=1, name="conv3")(x)
        x = jax.nn.relu(x)
        taps.append(x)
        x = nn.Conv(256, (3, 3), padding=1, name="conv4")(x)
        x = jax.nn.relu(x)
        taps.append(x)
        return taps


def _unit_normalize(f, eps=1e-10):
    # clamp INSIDE the sqrt: d sqrt(x)/dx -> inf at x=0, so the reference's
    # sqrt(sum f^2) + eps form (networks_basic.py:10-12) has a NaN gradient
    # wherever a ReLU feature vector is exactly zero (e.g. the constant
    # background of a render) — inversion optimizes THROUGH lpips, so the
    # gradient must be finite everywhere; values differ only where
    # ||f|| < eps, where the distance term is ~0 anyway
    n2 = jnp.sum(f * f, -1, keepdims=True)
    return f / jnp.sqrt(jnp.maximum(n2, eps * eps))


class LPIPS(nn.Module):
    """lpips(img0, img1) with images [B,H,W,3] in [-1,1] -> [B] distances."""

    net: str = "vgg"
    spatial_average: bool = True

    @nn.compact
    def __call__(self, x0, x1):
        shift = jnp.asarray(_SHIFT)
        scale = jnp.asarray(_SCALE)
        x0 = (x0 - shift) / scale
        x1 = (x1 - shift) / scale
        backbone = VGG16Features(name="backbone") if self.net == "vgg" else \
            AlexNetFeatures(name="backbone")
        chans = VGG_CHANNELS if self.net == "vgg" else ALEX_CHANNELS
        f0 = backbone(x0)
        f1 = backbone(x1)
        total = 0.0
        for i, (a, b) in enumerate(zip(f0, f1)):
            d = (_unit_normalize(a) - _unit_normalize(b)) ** 2
            w = self.param(
                f"lin{i}", nn.initializers.constant(1.0 / chans[i]), (chans[i],)
            )
            val = jnp.sum(d * jax.nn.relu(w), -1)  # non-negative 1x1 head
            total = total + jnp.mean(val, axis=(1, 2))
        return total


def load_lpips(net: str = "vgg", backbone_weights: str | None = None,
               linear_weights: str | None = None, rng=None):
    """(apply_fn, params). Loads the published linear heads if available and
    converts a torchvision backbone state dict if provided."""
    model = LPIPS(net=net)
    if rng is None:
        rng = jax.random.PRNGKey(0)
    dummy = jnp.zeros((1, 64, 64, 3))
    params = model.init(rng, dummy, dummy)["params"]
    if linear_weights is None:
        cand = f"/root/reference/lpips/weights/v0.1/{net}.pth"
        linear_weights = cand if os.path.exists(cand) else None
    if linear_weights:
        params = _load_linear_heads(linear_weights, params)
    if backbone_weights:
        params = _load_backbone(backbone_weights, params, net)

    def apply_fn(p, a, b):
        return model.apply({"params": p}, a, b)

    return apply_fn, params


def _load_linear_heads(path, params):
    import torch

    sd = torch.load(path, map_location="cpu")
    params = dict(params)
    for i in range(5):
        key = f"lin{i}.model.1.weight"
        if key in sd:
            w = sd[key].numpy().reshape(-1)  # (1, C, 1, 1) -> (C,)
            params[f"lin{i}"] = jnp.asarray(w)
    return params


def _load_backbone(path, params, net):
    import torch

    sd = torch.load(path, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    params = jax.tree_util.tree_map(lambda x: x, params)
    bb = dict(params["backbone"])
    # torchvision VGG16: features.{0,2,5,7,10,12,14,17,19,21,24,26,28}.weight
    conv_ids = {
        "vgg": [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28],
        "alex": [0, 3, 6, 8, 10],
    }[net]
    for i, tid in enumerate(conv_ids):
        wk, bk = f"features.{tid}.weight", f"features.{tid}.bias"
        if wk in sd:
            bb[f"conv{i}"] = {
                "kernel": jnp.asarray(np.transpose(sd[wk].numpy(), (2, 3, 1, 0))),
                "bias": jnp.asarray(sd[bk].numpy()),
            }
    params = dict(params)
    params["backbone"] = bb
    return params
