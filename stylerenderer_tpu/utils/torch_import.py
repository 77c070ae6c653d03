"""Import reference (PyTorch) checkpoints into this framework's param trees.

Maps the reference's state-dict names/layouts (model.py / layers.py module
structure) onto our flax trees:

- torch Linear ``[out, in]``            -> flax ``[in, out]`` (transpose)
- torch conv OIHW ``[out, in, kh, kw]`` -> HWIO ``[kh, kw, in, out]``
- ModulatedConv2d weight ``[1, out, in, kh, kw]`` -> HWIO
- ConstantInput ``[1, C, 4, 4]``        -> NHWC ``[1, 4, 4, C]``
- ToRGB bias ``[1, 3, 1, 1]``           -> ``[1, 1, 1, 3]``
- torch ConvLayer is an nn.Sequential: conv at index 0 (1 when downsampled,
  after the Blur), FusedLeakyReLU bias one index later.

Works with ``{g, d, g_ema, ...}`` checkpoint dicts (train.py:411-420) loaded
via ``torch.load``. The registered noise buffers ``noises.noise_%d`` are
imported by ``import_noise`` (exposed as ``g_noise`` / ``g_ema_noise``);
pass them as ``noise=`` at apply time to reproduce reference
``randomize_noise=False`` outputs — our own ``stored_noise`` constants are
different random draws.
"""

from __future__ import annotations

import math

import numpy as np


def _t(x):  # torch tensor / numpy -> numpy
    return x.detach().cpu().numpy() if hasattr(x, "detach") else np.asarray(x)


def _linear(sd, prefix):
    out = {"weight": _t(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        out["bias"] = _t(sd[f"{prefix}.bias"])
    return out


def _conv_oihw(w):
    return np.transpose(_t(w), (2, 3, 1, 0))


def _modconv(sd, prefix):
    w = _t(sd[f"{prefix}.weight"])[0]  # [out, in, kh, kw]
    return {
        "weight": np.transpose(w, (2, 3, 1, 0)),
        "modulation": _linear(sd, f"{prefix}.modulation"),
    }


def _styled_conv(sd, prefix):
    return {
        "conv": _modconv(sd, f"{prefix}.conv"),
        "noise": {"weight": _t(sd[f"{prefix}.noise.weight"]).reshape(())},
        "act_bias": _t(sd[f"{prefix}.activate.bias"]),
    }


def _to_rgb(sd, prefix):
    return {
        "conv": _modconv(sd, f"{prefix}.conv"),
        "bias": _t(sd[f"{prefix}.bias"]).reshape(1, 1, 1, 3),
    }


def _conv_layer(sd, prefix, downsample: bool, activate: bool = True,
                bias: bool = True):
    """torch ConvLayer(Sequential): [Blur]? EqualConv2d [FusedLeakyReLU]?"""
    ci = 1 if downsample else 0
    out = {"conv": {"weight": _conv_oihw(sd[f"{prefix}.{ci}.weight"])}}
    if bias and f"{prefix}.{ci}.bias" in sd:
        out["conv"]["bias"] = _t(sd[f"{prefix}.{ci}.bias"])
    if activate and f"{prefix}.{ci + 1}.bias" in sd:
        out["act_bias"] = _t(sd[f"{prefix}.{ci + 1}.bias"])
    return out


def _res_block(sd, prefix, downsample: bool = True):
    return {
        "conv1": _conv_layer(sd, f"{prefix}.conv1", False),
        "conv2": _conv_layer(sd, f"{prefix}.conv2", downsample),
        "skip": _conv_layer(sd, f"{prefix}.skip", downsample,
                            activate=False, bias=False),
    }


def _mapping(sd, prefix, n_mlp):
    # torch: Sequential([PixelNorm] + EqualLinear x n_mlp) -> indices 1..n_mlp
    return {
        f"fc{i}": _linear(sd, f"{prefix}.{i + 1}") for i in range(n_mlp)
    }


def import_noise(sd):
    """The reference's registered per-layer noise buffers ``noises.noise_%d``
    (model.py:114-119), torch [1,1,H,W] -> NHWC [1,H,W,1] list ordered by
    layer. Pass the result as ``noise=`` to Generator.apply so
    ``randomize_noise=False`` reproduces the reference's outputs bitwise
    (our ``stored_noise`` constants are different draws). Returns None when
    the state dict has no noise buffers."""
    keys = sorted(
        (k for k in sd if k.startswith("noises.noise_")),
        key=lambda k: int(k.rsplit("_", 1)[1]),
    )
    if not keys:
        return None
    return [np.transpose(_t(sd[k]), (0, 2, 3, 1)) for k in keys]


def import_generator(sd, size: int, n_mlp: int = 8, with_map: bool = False):
    """torch Generator / GeneratorWithMap state dict -> flax params tree."""
    log_size = int(math.log2(size))
    n_levels = log_size - 2
    params = {
        "style": _mapping(sd, "style", n_mlp),
        "input": {"input": np.transpose(_t(sd["input.input"]), (0, 2, 3, 1))},
        "conv1": _styled_conv(sd, "conv1"),
        "to_rgb1": _to_rgb(sd, "to_rgb1"),
    }
    for i in range(2 * n_levels):
        params[f"convs_{i}"] = _styled_conv(sd, f"convs.{i}")
    for i in range(n_levels):
        params[f"to_rgbs_{i}"] = _to_rgb(sd, f"to_rgbs.{i}")
    if with_map:
        params["norm1"] = _res_block(sd, "norm1", downsample=False)
        for i in range(n_levels):
            params[f"norm_to_style_{i}"] = _res_block(
                sd, f"norm_to_style.{i}", downsample=False
            )
    return params


def import_discriminator(sd, size: int):
    """torch Discriminator state dict -> flax params tree."""
    log_size = int(math.log2(size))
    params = {"from_rgb": _conv_layer(sd, "convs.0", False)}
    for idx, i in enumerate(range(log_size, 2, -1)):
        params[f"block{i}"] = _res_block(sd, f"convs.{idx + 1}")
    params["final_conv"] = _conv_layer(sd, "final_conv", False)
    params["final_linear0"] = _linear(sd, "final_linear.0")
    params["final_linear1"] = _linear(sd, "final_linear.1")
    return params


def import_checkpoint(path: str, size: int, n_mlp: int = 8,
                      with_map: bool = True):
    """Load a reference ``checkpoint/XXXXXX.pt`` and convert every present
    network. Returns a dict with any of g / d / g_ema as flax trees."""
    import torch

    ckpt = torch.load(path, map_location="cpu")
    out = {}
    for key in ("g", "g_ema"):
        if key in ckpt:
            out[key] = import_generator(ckpt[key], size, n_mlp, with_map)
            noise = import_noise(ckpt[key])
            if noise is not None:
                out[f"{key}_noise"] = noise
    if "d" in ckpt:
        out["d"] = import_discriminator(ckpt["d"], size)
    if "ada_aug_p" in ckpt:
        out["ada_aug_p"] = float(ckpt["ada_aug_p"])
    return out
