"""Remat option: identical outputs and gradients, for 1024px memory headroom."""

import numpy as np
import jax
import jax.numpy as jnp

from stylerenderer_tpu.models import GeneratorWithMap


def test_remat_outputs_and_grads_match():
    kwargs = dict(style_dim=32, n_mlp=2, channel_multiplier=1)
    g0 = GeneratorWithMap(16, **kwargs)
    g1 = GeneratorWithMap(16, remat=True, **kwargs)
    rng = np.random.RandomState(0)
    z = jnp.asarray(rng.randn(1, 32).astype(np.float32))
    v = jnp.asarray(rng.rand(1, 20, 3).astype(np.float32) - 0.5)
    n = jnp.asarray(rng.randn(1, 20, 3).astype(np.float32))
    tri = jnp.asarray(rng.randint(0, 20, (30, 3)).astype(np.int32))
    mesh = (v, n, tri)
    params = g0.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        [z], mesh,
    )
    noise = [jnp.zeros((1, 1, 1, 1))] * g0.num_layers
    img0, _, _ = g0.apply(params, [z], mesh, noise=noise)
    img1, _, _ = g1.apply(params, [z], mesh, noise=noise)
    np.testing.assert_allclose(np.asarray(img0), np.asarray(img1),
                               rtol=1e-5, atol=1e-6)

    def loss(g, p):
        img, _, _ = g.apply(p, [z], mesh, noise=noise)
        return jnp.mean(img**2)

    grad0 = jax.grad(lambda p: loss(g0, p))(params)["params"]
    grad1 = jax.grad(lambda p: loss(g1, p))(params)["params"]
    l0 = jax.tree_util.tree_leaves(grad0)
    l1 = jax.tree_util.tree_leaves(grad1)
    for a, b in zip(l0, l1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
