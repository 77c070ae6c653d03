"""Supervisor network tests: shapes/interfaces + a train step with all three
extra heads active (exercises geometry-paired batching and the extra losses)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from stylerenderer_tpu.supervisors import (
    InceptionResnetV1,
    PFLDInference,
    ResNetUNet,
    make_extra_heads,
)


def test_resnet_unet_shapes():
    net = ResNetUNet()
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 3))
    params = net.init(jax.random.PRNGKey(1), x)
    n, raw = net.apply(params, x)
    assert n.shape == (2, 64, 64, 3)
    norms = np.linalg.norm(np.asarray(n), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-3)


def test_pfld_shapes():
    net = PFLDInference()
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 112, 112, 3))
    params = net.init(jax.random.PRNGKey(1), x)
    lmk = net.apply(params, x)
    assert lmk.shape == (2, 136)
    assert np.isfinite(np.asarray(lmk)).all()


def test_facenet_embedding():
    net = InceptionResnetV1()
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 160, 160, 3))
    params = net.init(jax.random.PRNGKey(1), x)
    emb = net.apply(params, x)
    assert emb.shape == (2, 512)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(emb), axis=-1), 1.0, rtol=1e-4
    )
    # identical inputs -> identical embeddings; different inputs differ
    e2 = net.apply(params, x)
    np.testing.assert_array_equal(np.asarray(emb), np.asarray(e2))


def test_train_step_with_extra_heads():
    from stylerenderer_tpu.face3d import mesh_point_normal, synthetic_face
    from stylerenderer_tpu.train import init_train_state, make_models, make_train_step
    from stylerenderer_tpu.utils.config import TrainConfig

    cfg = TrainConfig(size=16, latent=16, n_mlp=1, channel_multiplier=1,
                      batch=4, d_reg_every=4, g_reg_every=4)
    face, tri = synthetic_face(6, 12, shape_dim=4, expression_dim=2)
    gen, disc = make_models(cfg)
    x = face.random_input(jax.random.PRNGKey(0), 2)
    v = face(x)
    n = mesh_point_normal(v, tri)
    state = init_train_state(cfg, jax.random.PRNGKey(1), (v, n, tri))
    heads = make_extra_heads(
        jax.random.PRNGKey(2), sfs=True, lmk=True, feat=True, image_size=16
    )
    step_fn = jax.jit(make_train_step(cfg, gen, disc, face, tri,
                                      extra_heads=heads))
    real = jax.random.normal(jax.random.PRNGKey(3), (4, 16, 16, 3))
    s, m = step_fn(state, real)
    for k in ("sfs", "feature", "lmk"):
        assert k in m, m.keys()
        assert np.isfinite(float(m[k])), (k, m[k])
