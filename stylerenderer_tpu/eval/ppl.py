"""Perceptual Path Length (reference ``ppl.py`` semantics, fixed of its
syntax/indent bugs — SURVEY.md §8):

pairs of latents, lerp in W (or slerp in Z), step eps=1e-4, LPIPS distance
scaled by 1/eps², optional center-crop, resize to 256, 1%/99% percentile
filter, mean. The reference's hand-written SLerp VJP (ppl.py:23-95) is
unnecessary here: slerp is closed-form jnp, autodiff just works.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def lerp(a, b, t):
    return a + (b - a) * t


def slerp(a, b, t, eps: float = 1e-8):
    """Spherical interpolation along the great circle between a and b."""
    an = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), eps)
    bn = b / jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True), eps)
    dot = jnp.clip(jnp.sum(an * bn, -1, keepdims=True), -1.0, 1.0)
    theta = jnp.arccos(dot)
    st = jnp.maximum(jnp.sin(theta), eps)
    w0 = jnp.sin((1 - t) * theta) / st
    w1 = jnp.sin(t * theta) / st
    # interpolate magnitudes linearly, directions spherically
    mag = lerp(
        jnp.linalg.norm(a, axis=-1, keepdims=True),
        jnp.linalg.norm(b, axis=-1, keepdims=True),
        t,
    )
    return (w0 * an + w1 * bn) * mag


def ppl_filtered_mean(distances, lo: float = 1.0, hi: float = 99.0):
    """Percentile-filtered mean (ppl.py:176-180)."""
    d = np.asarray(distances)
    plo = np.percentile(d, lo)
    phi = np.percentile(d, hi)
    sel = d[(d >= plo) & (d <= phi)]
    return float(sel.mean())


def make_ppl_sampler(
    map_fn, synth_fn, lpips_apply, latent_dim: int, *, space: str = "w",
    sampling: str = "end", eps: float = 1e-4, crop: bool = False,
):
    """Build a jittable ``(rng, batch) -> distances`` PPL sampler.

    map_fn(z) -> w; synth_fn(latents, input_is_latent) -> images [B,H,W,3];
    both expected to close over params and any mesh conditioning.
    """

    def sample(rng, batch):
        k1, k2, k3 = jax.random.split(rng, 3)
        z0 = jax.random.normal(k1, (batch, latent_dim))
        z1 = jax.random.normal(k2, (batch, latent_dim))
        if sampling == "full":
            t = jax.random.uniform(k3, (batch, 1))
        else:
            t = jnp.zeros((batch, 1))
        if space == "w":
            # lerp between MAPPED latents (ppl.py W branch)
            w0, w1 = map_fn(z0), map_fn(z1)
            img0 = synth_fn(lerp(w0, w1, t), True)
            img1 = synth_fn(lerp(w0, w1, t + eps), True)
        else:
            # slerp in Z, mapping inside the synthesis call
            img0 = synth_fn(slerp(z0, z1, t), False)
            img1 = synth_fn(slerp(z0, z1, t + eps), False)
        if crop:
            h = img0.shape[1]
            c0, c1 = h // 8 * 2, h // 8 * 6
            img0 = img0[:, c0:c1, c0:c1]
            img1 = img1[:, c0:c1, c0:c1]
        if img0.shape[1] > 256:
            factor = img0.shape[1] // 256
            img0 = jax.image.resize(
                img0, (img0.shape[0], 256, 256, 3), "bilinear"
            )
            img1 = jax.image.resize(
                img1, (img1.shape[0], 256, 256, 3), "bilinear"
            )
        d = lpips_apply(img0, img1) / (eps**2)
        return d

    return sample


def compute_ppl(sampler, rng, n_samples: int, batch: int):
    dists = []
    n_batches = (n_samples + batch - 1) // batch
    for _ in range(n_batches):
        rng, k = jax.random.split(rng)
        dists.append(np.asarray(sampler(k, batch)))
    d = np.concatenate(dists)[:n_samples]
    return ppl_filtered_mean(d)
