"""torch -> flax state-dict converters for the three thirdparty supervisor
nets the reference loads (train.py:502-528):

- ``convert_face_normals``: face_normals ``ResNetUNet(n_class=3)``
  (``data/model.pth`` — resnet18-encoder UNet, torchvision trunk naming);
- ``convert_pfld``: pytorch_face_landmark ``PFLDInference``
  (``pfld_model_best.pth.tar['state_dict']``, PFLD-pytorch naming);
- ``convert_facenet``: facenet-pytorch ``InceptionResnetV1``
  (vggface2 checkpoint naming).

Each converter is loud: a missing torch key raises KeyError naming it, so a
layout drift between a published checkpoint and the flax port is detected at
load time, never silently trained around. Validated against torch mirror
modules with random weights in ``tests/test_supervisor_convert.py``.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _k(sd, name):
    w = sd[name]
    return w.detach().numpy() if hasattr(w, "detach") else np.asarray(w)


def _conv(sd, name, bias=False):
    out = {"kernel": jnp.asarray(np.transpose(_k(sd, name + ".weight"),
                                              (2, 3, 1, 0)))}
    if bias:
        out["bias"] = jnp.asarray(_k(sd, name + ".bias"))
    return out


def _bn(sd, name):
    return {
        "scale": jnp.asarray(_k(sd, name + ".weight")),
        "bias": jnp.asarray(_k(sd, name + ".bias")),
        "mean": jnp.asarray(_k(sd, name + ".running_mean")),
        "var": jnp.asarray(_k(sd, name + ".running_var")),
    }


def _load(path_or_sd, subkey=None):
    if isinstance(path_or_sd, (str,)):
        import torch

        sd = torch.load(path_or_sd, map_location="cpu")
    else:
        sd = path_or_sd
    if subkey and subkey in sd:
        sd = sd[subkey]
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return sd


# ---------------------------------------------------------------------------
# face_normals ResNetUNet
# ---------------------------------------------------------------------------


def _resnet_block(sd, prefix):
    p = {
        "conv1": _conv(sd, prefix + ".conv1"),
        "bn1": _bn(sd, prefix + ".bn1"),
        "conv2": _conv(sd, prefix + ".conv2"),
        "bn2": _bn(sd, prefix + ".bn2"),
    }
    if prefix + ".downsample.0.weight" in sd:
        p["down_conv"] = _conv(sd, prefix + ".downsample.0")
        p["down_bn"] = _bn(sd, prefix + ".downsample.1")
    return p


def convert_face_normals(path_or_sd):
    """face_normals ``model.pth`` -> flax ``ResNetUNet`` params.

    Accepts both the ``base_model.*`` and bare torchvision trunk namings
    (the UNet registers the resnet children twice)."""
    sd = _load(path_or_sd)
    if "base_model.conv1.weight" in sd and "conv1.weight" not in sd:
        sd = {k[len("base_model."):] if k.startswith("base_model.") else k: v
              for k, v in sd.items()}
    params = {
        "conv1": _conv(sd, "conv1"),
        "bn1": _bn(sd, "bn1"),
    }
    for li in range(1, 5):
        for bi in range(2):
            params[f"layer{li}_{bi}"] = _resnet_block(sd, f"layer{li}.{bi}")
    for name in ("layer0_1x1", "layer1_1x1", "layer2_1x1", "layer3_1x1",
                 "layer4_1x1", "conv_up0", "conv_up1", "conv_up2", "conv_up3",
                 "conv_original_size0", "conv_original_size1",
                 "conv_original_size2"):
        params[name] = _conv(sd, name + ".0", bias=True)  # convrelu Sequential
    params["conv_last"] = _conv(sd, "conv_last", bias=True)
    return params


# ---------------------------------------------------------------------------
# PFLD
# ---------------------------------------------------------------------------


def _inverted_residual(sd, prefix):
    """PFLD InvertedResidual Sequential: 0 pw, 1 bn, 3 dw, 4 bn, 6 pw, 7 bn."""
    return {
        "pw": _conv(sd, prefix + ".conv.0"),
        "bn1": _bn(sd, prefix + ".conv.1"),
        "dw": _conv(sd, prefix + ".conv.3"),
        "bn2": _bn(sd, prefix + ".conv.4"),
        "pw2": _conv(sd, prefix + ".conv.6"),
        "bn3": _bn(sd, prefix + ".conv.7"),
    }


def convert_pfld(path_or_sd):
    """``pfld_model_best.pth.tar['state_dict']`` -> flax ``PFLDInference``
    params (train.py:515-517 loads exactly that subkey)."""
    sd = _load(path_or_sd, subkey="state_dict")
    # some checkpoints prefix 'pfld_backbone.' or 'module.'
    for pre in ("module.", "pfld_backbone."):
        if any(k.startswith(pre) for k in sd):
            sd = {k[len(pre):] if k.startswith(pre) else k: v
                  for k, v in sd.items()}
    params = {
        "conv1": _conv(sd, "conv1"),
        "bn1": _bn(sd, "bn1"),
        "conv2": _conv(sd, "conv2"),
        "bn2": _bn(sd, "bn2"),
        "conv3_1": _inverted_residual(sd, "conv3_1"),
        "conv4_1": _inverted_residual(sd, "conv4_1"),
        "conv5_1": _inverted_residual(sd, "conv5_1"),
        "conv6_1": _inverted_residual(sd, "conv6_1"),
    }
    for i in range(2, 6):
        params[f"block3_{i}"] = _inverted_residual(sd, f"block3_{i}")
    for i in range(2, 7):
        params[f"block5_{i}"] = _inverted_residual(sd, f"block5_{i}")
    # conv7 = conv_bn Sequential(conv, bn, relu)
    params["conv7"] = _conv(sd, "conv7.0")
    params["bn7"] = _bn(sd, "conv7.1")
    params["conv8"] = _conv(sd, "conv8", bias=True)
    params["fc"] = {
        "kernel": jnp.asarray(_k(sd, "fc.weight").T),
        "bias": jnp.asarray(_k(sd, "fc.bias")),
    }
    return params


# ---------------------------------------------------------------------------
# facenet InceptionResnetV1
# ---------------------------------------------------------------------------


def _convbn(sd, prefix):
    """facenet BasicConv2d: .conv (no bias) + .bn."""
    bn = _bn(sd, prefix + ".bn")
    return {
        "conv": _conv(sd, prefix + ".conv"),
        "bn_scale": bn["scale"],
        "bn_bias": bn["bias"],
        "bn_mean": bn["mean"],
        "bn_var": bn["var"],
    }


def _facenet_block(sd, prefix, branches):
    """Block35/17/8: branchN(.M) BasicConv2ds + the biased 1x1 'conv2d'."""
    p = {}
    for flax_name, torch_name in branches:
        p[flax_name] = _convbn(sd, f"{prefix}.{torch_name}")
    p["up"] = _conv(sd, prefix + ".conv2d", bias=True)
    return p


_B35 = [("b0", "branch0"), ("b1_0", "branch1.0"), ("b1_1", "branch1.1"),
        ("b2_0", "branch2.0"), ("b2_1", "branch2.1"), ("b2_2", "branch2.2")]
_B17 = [("b0", "branch0"), ("b1_0", "branch1.0"), ("b1_1", "branch1.1"),
        ("b1_2", "branch1.2")]
_B8 = _B17


def convert_facenet(path_or_sd):
    """facenet-pytorch ``InceptionResnetV1`` state dict -> flax params
    (train.py:523-526 loads the 'vggface2' pretrained instance)."""
    sd = _load(path_or_sd)
    params = {}
    for name in ("conv2d_1a", "conv2d_2a", "conv2d_2b", "conv2d_3b",
                 "conv2d_4a", "conv2d_4b"):
        params[name] = _convbn(sd, name)
    for i in range(5):
        params[f"repeat_1_{i}"] = _facenet_block(sd, f"repeat_1.{i}", _B35)
    params["mixed_6a_b0"] = _convbn(sd, "mixed_6a.branch0")
    for j in range(3):
        params[f"mixed_6a_b1_{j}"] = _convbn(sd, f"mixed_6a.branch1.{j}")
    for i in range(10):
        params[f"repeat_2_{i}"] = _facenet_block(sd, f"repeat_2.{i}", _B17)
    for j in range(2):
        params[f"mixed_7a_b0_{j}"] = _convbn(sd, f"mixed_7a.branch0.{j}")
        params[f"mixed_7a_b1_{j}"] = _convbn(sd, f"mixed_7a.branch1.{j}")
    for j in range(3):
        params[f"mixed_7a_b2_{j}"] = _convbn(sd, f"mixed_7a.branch2.{j}")
    for i in range(5):
        params[f"repeat_3_{i}"] = _facenet_block(sd, f"repeat_3.{i}", _B8)
    params["block8"] = _facenet_block(sd, "block8", _B8)
    params["last_linear"] = {
        "kernel": jnp.asarray(_k(sd, "last_linear.weight").T)
    }
    bn = _bn(sd, "last_bn")
    params["last_bn_scale"] = bn["scale"]
    params["last_bn_bias"] = bn["bias"]
    params["last_bn_mean"] = bn["mean"]
    params["last_bn_var"] = bn["var"]
    return params
