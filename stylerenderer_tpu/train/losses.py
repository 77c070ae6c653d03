"""GAN losses and regularizers (reference ``train.py:105-134``), functional."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def d_logistic_loss(real_pred, fake_pred):
    """softplus(-real).mean() + softplus(fake).mean() (train.py:105-109)."""
    return jnp.mean(jax.nn.softplus(-real_pred)) + jnp.mean(jax.nn.softplus(fake_pred))


def g_nonsaturating_loss(fake_pred):
    """softplus(-fake).mean() (train.py:115-117)."""
    return jnp.mean(jax.nn.softplus(-fake_pred))


def r1_penalty(disc_apply, params, real_img):
    """R1 gradient penalty: E[ ||∇_x D(x)||² ] on reals (train.py:110-114)."""

    def pred_sum(img):
        return jnp.sum(disc_apply(params, img))

    grad_real = jax.grad(pred_sum)(real_img)
    b = grad_real.shape[0]
    return jnp.mean(jnp.sum(grad_real.reshape(b, -1) ** 2, axis=1))


def path_lengths_multi(synth_fn, rng, inputs, lambdas=None):
    """Path lengths of a synthesis function over MULTIPLE latent tensors.

    The reference extends StyleGAN2's path-length regularizer to include the
    rasterized normal-map pyramid alongside W (train.py:118-134): the
    Jacobian-vector products are taken wrt every tensor in ``inputs`` and
    their norms combined with per-tensor weights.

    Args:
      synth_fn: ``(*inputs) -> image [B, H, W, C]``.
      rng: key for the image-space probe noise.
      inputs: tuple of tensors, each with leading batch dim.
      lambdas: per-input weights (default 1).
    Returns:
      path_lengths [B].
    """
    img = synth_fn(*inputs)
    b, h, w = img.shape[0], img.shape[1], img.shape[2]
    noise = jax.random.normal(rng, img.shape, img.dtype) / np.sqrt(h * w)

    def probe(*xs):
        return jnp.sum(synth_fn(*xs) * noise)

    grads = jax.grad(probe, argnums=tuple(range(len(inputs))))(*inputs)
    if lambdas is None:
        lambdas = [1.0] * len(inputs)
    pl = 0.0
    for lam, g in zip(lambdas, grads):
        g2 = jnp.sum(g.reshape(g.shape[0], -1) ** 2, axis=1)
        # guard sqrt'(0) = inf: a probe gradient can be exactly zero (an
        # input tensor that does not reach the output); value shift <= 1e-12
        pl = pl + jnp.sqrt(jnp.maximum(g2, 1e-24)) * lam
    return pl


def path_regularize(path_lengths, mean_path_length, decay: float = 0.01):
    """(pl - running_mean)² penalty + updated running mean (train.py:128-134)."""
    path_mean = mean_path_length + decay * (jnp.mean(path_lengths) - mean_path_length)
    penalty = jnp.mean((path_lengths - path_mean) ** 2)
    return penalty, jax.lax.stop_gradient(path_mean)
