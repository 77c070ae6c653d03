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


def test_paired_geometry_semantics():
    """Reference pairing rules (train.py:294-309): with 'lmk' active,
    interleaved pairs share the FULL posed geometry (identical rendered
    normal pyramids); with 'feat' active, halves share styles and the
    shape components of the 3DMM params but not expression/pose."""
    from stylerenderer_tpu.face3d import mesh_point_normal, synthetic_face
    from stylerenderer_tpu.train import make_models
    from stylerenderer_tpu.train.step import sample_g_inputs
    from stylerenderer_tpu.utils.config import TrainConfig

    cfg = TrainConfig(size=16, latent=16, n_mlp=1, channel_multiplier=1, batch=6)
    face, tri = synthetic_face(6, 12, shape_dim=4, expression_dim=2)
    gen, _ = make_models(cfg)
    batch = 6
    half, res = (batch + 1) // 2, batch - (batch + 1) // 2
    k1, k2 = jax.random.PRNGKey(10), jax.random.PRNGKey(11)

    # --- lmk: vert/norm interleave-paired, styles NOT paired ---
    styles, _, vert, norm, _ = sample_g_inputs(
        cfg, gen, face, tri, {"lmk": None}, k1, k2, batch
    )
    np.testing.assert_array_equal(np.asarray(vert[1::2]), np.asarray(vert[: res * 2 : 2]))
    np.testing.assert_array_equal(np.asarray(norm[1::2]), np.asarray(norm[: res * 2 : 2]))
    assert not np.array_equal(np.asarray(styles[0][0]), np.asarray(styles[0][1]))

    # paired halves render IDENTICAL normal pyramids (the reference's
    # guarantee that the lmk loss compares same-geometry images)
    x0 = face.random_input(jax.random.PRNGKey(0), 2)
    variables = gen.init(
        {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)},
        [jax.random.normal(jax.random.PRNGKey(3), (2, cfg.latent))],
        (face(x0), mesh_point_normal(face(x0), tri), tri),
    )
    pyramid = gen.apply(
        {"params": variables["params"]}, (vert, norm, tri), method=gen.normal_pyramid
    )
    for m in pyramid:
        np.testing.assert_array_equal(
            np.asarray(m[1::2]), np.asarray(m[: res * 2 : 2])
        )

    # --- feat: styles + shape params paired across halves; geometry differs ---
    styles, _, vert, _, face_x = sample_g_inputs(
        cfg, gen, face, tri, {"feat": None}, k1, k2, batch
    )
    for s in styles:
        np.testing.assert_array_equal(np.asarray(s[half:]), np.asarray(s[:res]))
    dim0 = face.dim[0]
    np.testing.assert_array_equal(
        np.asarray(face_x[half:, :dim0]), np.asarray(face_x[:res, :dim0])
    )
    # expression params stay independent -> full geometry differs
    assert not np.array_equal(
        np.asarray(face_x[half:, dim0:]), np.asarray(face_x[:res, dim0:])
    )
    assert not np.array_equal(np.asarray(vert[half:]), np.asarray(vert[:res]))


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
