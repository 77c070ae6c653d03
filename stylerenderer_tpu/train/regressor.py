"""Regressor (inversion encoder) training — "Render Inverting" stage 1.

The reference defines the Regressor (model.py:337-387) but never trains or
uses it; the paper's pipeline needs an encoder to initialize the fit. Here:
self-supervised training on the generator's own samples — draw (w, mesh),
render, regress w back from the image:

    z ~ N(0,1); w = mapping(z); img = GAR(w, mesh);  loss = ||R(img) - w||²

All on-device, one jitted step; the trained encoder plugs into
``inversion.make_projector(regressor_fn=...)``.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct

from stylerenderer_tpu.face3d.geometry import mesh_point_normal, random_apply_pose3D


@struct.dataclass
class RegressorState:
    params: dict
    opt: object
    step: jnp.ndarray
    rng: jax.Array


def make_regressor_trainer(
    regressor, gen, g_params, face, tri, *, batch: int, lr: float = 1e-4,
):
    """-> (init_fn(rng) -> RegressorState, step_fn(state) -> (state, metrics))."""
    tx = optax.adam(lr)
    n_latent = gen.n_latent

    def sample_batch(rng):
        kz, kf, kp, kn = jax.random.split(rng, 4)
        z = jax.random.normal(kz, (batch, gen.style_dim))
        w = gen.apply({"params": g_params}, z, method=gen.get_latent)
        x = face.random_input(kf, batch)
        vert = random_apply_pose3D(kp, face(x))
        norm = mesh_point_normal(vert, tri)
        latent = jnp.tile(w[:, None, :], (1, n_latent, 1))
        pyramid = gen.apply(
            {"params": g_params}, (vert, norm, tri), method=gen.normal_pyramid
        )
        img = gen.apply(
            {"params": g_params}, latent, pyramid,
            method=gen.synthesize, rngs={"noise": kn},
        )
        return jax.lax.stop_gradient(img), jax.lax.stop_gradient(w)

    def init_fn(rng):
        # everything under jit: on the axon backend EAGER execution costs a
        # ~15-20 ms dispatch round-trip PER PRIMITIVE, so an un-jitted 256px
        # generator forward here takes tens of minutes (measured round 5)
        k1, k2 = jax.random.split(rng)
        img_shape = jax.eval_shape(sample_batch, k1)[0]  # no device work
        params = jax.jit(lambda k, s: regressor.init(k, s)["params"])(
            k2, jnp.zeros(img_shape.shape, img_shape.dtype)
        )
        return RegressorState(
            params=params, opt=tx.init(params),
            step=jnp.zeros((), jnp.int32), rng=rng,
        )

    def step_fn(state: RegressorState):
        rng, k = jax.random.split(state.rng)
        img, w_true = sample_batch(k)

        def loss_fn(p):
            w_pred = regressor.apply({"params": p}, img)
            # the Regressor pixel-norms its output; compare directions
            w_dir = w_true / jnp.sqrt(
                jnp.mean(w_true**2, -1, keepdims=True) + 1e-8
            )
            return jnp.mean((w_pred - w_dir) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt = tx.update(grads, state.opt, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = RegressorState(
            params=params, opt=opt, step=state.step + 1, rng=rng
        )
        return new_state, {"regressor_loss": loss}

    return init_fn, step_fn


def make_regressor_fn(regressor, params, mean_w_norm: float = 1.0) -> Callable:
    """Wrap trained params as the projector's init hook: img -> w [B, D]."""

    def fn(img):
        return regressor.apply({"params": params}, img) * mean_w_norm

    return fn
