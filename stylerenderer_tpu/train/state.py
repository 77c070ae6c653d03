"""Training state pytree: G/D params, EMA, optimizer states, ADA controller,
path-length running mean, PRNG — everything the reference scatters across
python objects and the checkpoint dict (train.py:411-420), as one
checkpointable struct."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from stylerenderer_tpu.models import Discriminator, GeneratorWithMap
from stylerenderer_tpu.utils.config import TrainConfig


@struct.dataclass
class TrainState:
    g_params: Any
    d_params: Any
    g_ema: Any
    g_opt: Any
    d_opt: Any
    step: jnp.ndarray  # int32 scalar
    mean_path_length: jnp.ndarray  # f32 scalar
    ada_p: jnp.ndarray  # f32 scalar
    ada_signs: jnp.ndarray  # f32 scalar (accumulated sign(real_pred))
    ada_count: jnp.ndarray  # f32 scalar
    rng: jax.Array
    # steps whose update was discarded by the in-jit finite screen
    nonfinite_count: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.zeros((), jnp.int32)
    )


def make_optimizers(cfg: TrainConfig):
    """Adam with reg-ratio-scaled lr/betas (train.py:529-536)."""
    g_tx = optax.adam(
        cfg.lr * cfg.g_reg_ratio, b1=0.0, b2=0.99**cfg.g_reg_ratio, eps=1e-8
    )
    d_tx = optax.adam(
        cfg.lr * cfg.d_reg_ratio, b1=0.0, b2=0.99**cfg.d_reg_ratio, eps=1e-8
    )
    return g_tx, d_tx


def make_models(cfg: TrainConfig):
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    gen = GeneratorWithMap(
        cfg.size, cfg.latent, cfg.n_mlp,
        channel_multiplier=cfg.channel_multiplier, dtype=dtype,
        pyramid_mode=cfg.pyramid_mode,
    )
    disc = Discriminator(cfg.size, cfg.channel_multiplier, dtype=dtype)
    return gen, disc


def init_train_state(cfg: TrainConfig, rng, mesh_example) -> TrainState:
    """Initialize params/EMA/optimizers. ``mesh_example`` = (vert, norm, tri)
    with the production vertex/triangle counts (shapes are baked into jit).

    The whole init runs under ONE jit: on the axon backend eager execution
    costs a ~15-20 ms dispatch round-trip per primitive, so an un-jitted
    256px init (hundreds of layer inits + the pyramid rasterization) takes
    tens of minutes (measured round 5)."""
    gen, disc = make_models(cfg)
    g_tx, d_tx = make_optimizers(cfg)

    @jax.jit
    def _init(rng, mesh_example):
        return _build_state(cfg, gen, disc, g_tx, d_tx, rng, mesh_example)

    return _init(rng, mesh_example)


def _build_state(cfg, gen, disc, g_tx, d_tx, rng, mesh_example):
    k1, k2, k3, k4, k5 = jax.random.split(rng, 5)
    z = jnp.zeros((2, cfg.latent))
    g_vars = gen.init({"params": k1, "noise": k2}, [z], mesh_example)
    d_vars = disc.init(k3, jnp.zeros((2, cfg.size, cfg.size, 3)))
    g_params = g_vars["params"]
    d_params = d_vars["params"]
    return TrainState(
        g_params=g_params,
        d_params=d_params,
        g_ema=jax.tree_util.tree_map(jnp.copy, g_params),
        g_opt=g_tx.init(g_params),
        d_opt=d_tx.init(d_params),
        step=jnp.zeros((), jnp.int32),
        mean_path_length=jnp.zeros(()),
        ada_p=jnp.asarray(cfg.augment_p if cfg.augment_p > 0 else 0.0, jnp.float32),
        ada_signs=jnp.zeros(()),
        ada_count=jnp.zeros(()),
        rng=k5,
    )
