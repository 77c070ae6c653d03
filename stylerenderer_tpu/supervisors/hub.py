"""Assemble the extra_heads dict for make_train_step (train.py:502-528
semantics: each supervisor is optional; missing ones are skipped)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _maybe_convert(params, converter):
    """A checkpoint path or a raw torch state dict (flat dot-separated keys)
    is converted; an already-flax param pytree (nested dicts) or None passes
    through."""
    if isinstance(params, str):
        return converter(params)
    if hasattr(params, "keys") and any(
            isinstance(k, str) and "." in k for k in params.keys()):
        return converter(params)
    return params


def _make_sfs(rng, image_size, params):
    from stylerenderer_tpu.supervisors.convert import convert_face_normals
    from stylerenderer_tpu.supervisors.face_normals import ResNetUNet

    net = ResNetUNet()
    params = _maybe_convert(params, convert_face_normals)
    # the resnet18-UNet needs /32-divisible input (as does the published
    # torch net — the reference only ever feeds 256px, train.py:319); for
    # smaller test configs run at the next multiple of 32 and resize back
    run_size = max(32, -(-image_size // 32) * 32)
    if params is None:
        params = net.init(rng, jnp.zeros((1, run_size, run_size, 3)))[
            "params"
        ]

    def sfs_fn(img, net=net, params=params, run_size=run_size):
        B = img.shape[0]
        x = img
        if img.shape[1] != run_size:
            x = jax.image.resize(x, (B, run_size, run_size, 3), "bilinear")
        n, _ = net.apply({"params": params}, x)
        if img.shape[1] != run_size:
            n = jax.image.resize(
                n, (B, img.shape[1], img.shape[2], 3), "bilinear"
            )
        return n

    return sfs_fn


def _make_lmk(rng, params):
    from stylerenderer_tpu.supervisors.convert import convert_pfld
    from stylerenderer_tpu.supervisors.landmark import PFLDInference

    net = PFLDInference()
    size = 112
    params = _maybe_convert(params, convert_pfld)
    if params is None:
        params = net.init(rng, jnp.zeros((1, size, size, 3)))["params"]

    def lmk_fn(img, net=net, params=params, size=size):
        x = jax.image.resize(img, (img.shape[0], size, size, 3), "bilinear")
        return net.apply({"params": params}, (x + 1) / 2)

    return lmk_fn


def _make_feat(rng, params):
    from stylerenderer_tpu.supervisors.convert import convert_facenet
    from stylerenderer_tpu.supervisors.recognition import InceptionResnetV1

    net = InceptionResnetV1()
    size = 160
    params = _maybe_convert(params, convert_facenet)
    if params is None:
        params = net.init(rng, jnp.zeros((1, size, size, 3)))["params"]

    def feat_fn(img, net=net, params=params, size=size):
        x = jax.image.resize(img, (img.shape[0], size, size, 3), "bilinear")
        return net.apply({"params": params}, x)

    return feat_fn


def make_extra_heads(
    rng,
    *,
    sfs: bool = False,
    lmk: bool = False,
    feat: bool = False,
    image_size: int = 256,
    sfs_params=None,
    lmk_params=None,
    feat_params=None,
):
    """Build ``{'sfs': fn, 'lmk': fn, 'feat': fn}`` callables closing over
    frozen parameters (converted from published torch weights when given,
    else fixed-seed random — architecture-correct stand-ins)."""
    heads = {}
    k1, k2, k3 = jax.random.split(rng, 3)
    if sfs:
        heads["sfs"] = _make_sfs(k1, image_size, sfs_params)
    if lmk:
        heads["lmk"] = _make_lmk(k2, lmk_params)
    if feat:
        heads["feat"] = _make_feat(k3, feat_params)
    return heads
