"""Torch-checkpoint import roundtrip: serialize our params into a state dict
with the reference's exact names/layouts, import it back, and verify the
networks produce identical outputs — validates every name and transpose."""

import math

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from stylerenderer_tpu.models import Discriminator, GeneratorWithMap
from stylerenderer_tpu.utils.torch_import import (
    import_discriminator,
    import_generator,
    import_noise,
)


def _to_torch_linear(sd, prefix, p):
    sd[f"{prefix}.weight"] = np.asarray(p["weight"]).T
    if "bias" in p:
        sd[f"{prefix}.bias"] = np.asarray(p["bias"])


def _to_torch_modconv(sd, prefix, p):
    w = np.transpose(np.asarray(p["weight"]), (3, 2, 0, 1))[None]
    sd[f"{prefix}.weight"] = w
    _to_torch_linear(sd, f"{prefix}.modulation", p["modulation"])


def _to_torch_styled(sd, prefix, p):
    _to_torch_modconv(sd, f"{prefix}.conv", p["conv"])
    sd[f"{prefix}.noise.weight"] = np.asarray(p["noise"]["weight"]).reshape(1)
    sd[f"{prefix}.activate.bias"] = np.asarray(p["act_bias"])


def _to_torch_torgb(sd, prefix, p):
    _to_torch_modconv(sd, f"{prefix}.conv", p["conv"])
    sd[f"{prefix}.bias"] = np.asarray(p["bias"]).reshape(1, 3, 1, 1)


def _to_torch_convlayer(sd, prefix, p, downsample):
    ci = 1 if downsample else 0
    sd[f"{prefix}.{ci}.weight"] = np.transpose(
        np.asarray(p["conv"]["weight"]), (3, 2, 0, 1)
    )
    if "bias" in p["conv"]:
        sd[f"{prefix}.{ci}.bias"] = np.asarray(p["conv"]["bias"])
    if "act_bias" in p:
        sd[f"{prefix}.{ci + 1}.bias"] = np.asarray(p["act_bias"])


def _to_torch_resblock(sd, prefix, p, downsample):
    _to_torch_convlayer(sd, f"{prefix}.conv1", p["conv1"], False)
    _to_torch_convlayer(sd, f"{prefix}.conv2", p["conv2"], downsample)
    _to_torch_convlayer(sd, f"{prefix}.skip", p["skip"], downsample)


def test_generator_roundtrip():
    size, n_mlp = 16, 2
    g = GeneratorWithMap(size, 32, n_mlp, channel_multiplier=1)
    rng = np.random.RandomState(0)
    z = jnp.asarray(rng.randn(1, 32).astype(np.float32))
    v = jnp.asarray(rng.rand(1, 20, 3).astype(np.float32) - 0.5)
    n = jnp.asarray(rng.randn(1, 20, 3).astype(np.float32))
    tri = jnp.asarray(rng.randint(0, 20, (30, 3)).astype(np.int32))
    mesh = (v, n, tri)
    params = g.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        [z], mesh,
    )["params"]

    # write a reference-named state dict from our params
    sd = {}
    for i in range(n_mlp):
        _to_torch_linear(sd, f"style.{i + 1}", params["style"][f"fc{i}"])
    sd["input.input"] = np.transpose(np.asarray(params["input"]["input"]),
                                     (0, 3, 1, 2))
    _to_torch_styled(sd, "conv1", params["conv1"])
    _to_torch_torgb(sd, "to_rgb1", params["to_rgb1"])
    n_levels = int(math.log2(size)) - 2
    for i in range(2 * n_levels):
        _to_torch_styled(sd, f"convs.{i}", params[f"convs_{i}"])
    for i in range(n_levels):
        _to_torch_torgb(sd, f"to_rgbs.{i}", params[f"to_rgbs_{i}"])
    _to_torch_resblock(sd, "norm1", params["norm1"], False)
    for i in range(n_levels):
        _to_torch_resblock(sd, f"norm_to_style.{i}",
                           params[f"norm_to_style_{i}"], False)

    # the reference's registered noise buffers (model.py:114-119)
    for i in range(g.num_layers):
        res = 2 ** ((i + 5) // 2)
        sd[f"noises.noise_{i}"] = rng.randn(1, 1, res, res).astype(np.float32)

    imported = import_generator(sd, size, n_mlp, with_map=True)
    imported = jax.tree_util.tree_map(jnp.asarray, imported)

    noise = [jnp.zeros((1, 1, 1, 1))] * g.num_layers
    img_a, _, _ = g.apply({"params": params}, [z], mesh, noise=noise)
    img_b, _, _ = g.apply({"params": imported}, [z], mesh, noise=noise)
    np.testing.assert_allclose(np.asarray(img_a), np.asarray(img_b),
                               rtol=1e-5, atol=1e-6)

    # stored-noise import: NCHW buffers -> NHWC list in layer order, and the
    # generator reproduces itself bitwise when fed the imported buffers
    imp_noise = import_noise(sd)
    assert len(imp_noise) == g.num_layers
    for i, nz in enumerate(imp_noise):
        res = 2 ** ((i + 5) // 2)
        assert nz.shape == (1, res, res, 1)
        np.testing.assert_array_equal(
            nz[..., 0], sd[f"noises.noise_{i}"][:, 0]
        )
    imp_noise = [jnp.asarray(nz) for nz in imp_noise]
    img_c, _, _ = g.apply({"params": imported}, [z], mesh, noise=imp_noise)
    img_d, _, _ = g.apply({"params": params}, [z], mesh, noise=imp_noise)
    np.testing.assert_allclose(np.asarray(img_c), np.asarray(img_d),
                               rtol=1e-5, atol=1e-6)
    assert import_noise({"conv1.weight": np.zeros(1)}) is None


def test_discriminator_roundtrip():
    size = 16
    d = Discriminator(size, channel_multiplier=1)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, size, size, 3))
    params = d.init(jax.random.PRNGKey(1), x)["params"]

    sd = {}
    _to_torch_convlayer(sd, "convs.0", params["from_rgb"], False)
    log_size = int(math.log2(size))
    for idx, i in enumerate(range(log_size, 2, -1)):
        _to_torch_resblock(sd, f"convs.{idx + 1}", params[f"block{i}"], True)
    _to_torch_convlayer(sd, "final_conv", params["final_conv"], False)
    _to_torch_linear(sd, "final_linear.0", params["final_linear0"])
    _to_torch_linear(sd, "final_linear.1", params["final_linear1"])

    imported = jax.tree_util.tree_map(
        jnp.asarray, import_discriminator(sd, size)
    )
    out_a = d.apply({"params": params}, x)
    out_b = d.apply({"params": imported}, x)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b),
                               rtol=1e-5, atol=1e-6)
