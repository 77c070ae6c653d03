"""Regressor (inversion encoder) self-supervised training: the loss must
decrease when regressing w from the generator's own renders."""

import numpy as np
import jax

from stylerenderer_tpu.face3d import mesh_point_normal, synthetic_face
from stylerenderer_tpu.models import GeneratorWithMap, Regressor
from stylerenderer_tpu.train import make_regressor_trainer


def test_regressor_training_reduces_loss():
    gen = GeneratorWithMap(16, 32, 2, channel_multiplier=1)
    reg = Regressor(16, 32, 2, channel_multiplier=1)
    face, tri = synthetic_face(6, 12, shape_dim=4, expression_dim=2)
    import jax.numpy as jnp

    z = jnp.zeros((2, 32))
    x = face.random_input(jax.random.PRNGKey(0), 2)
    v = face(x)
    n = mesh_point_normal(v, tri)
    g_params = gen.init(
        {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)},
        [z], (v, n, tri),
    )["params"]

    init_fn, step_fn = make_regressor_trainer(
        reg, gen, g_params, face, tri, batch=4, lr=3e-4
    )
    state = init_fn(jax.random.PRNGKey(3))
    step_fn = jax.jit(step_fn)
    losses = []
    for _ in range(30):
        state, m = step_fn(state)
        losses.append(float(m["regressor_loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5]), losses[:3] + losses[-3:]
