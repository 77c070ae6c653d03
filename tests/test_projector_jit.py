"""make_projector_jit must be output-identical to make_projector while
passing every parameter tree as a jit ARGUMENT — closure-captured trees are
embedded by value into the lowered HLO, which at 256px (g_ema + VGG16 +
Regressor) exceeds what a compile service will buffer (the dev backend's
remote-compile relay rejects the upload with HTTP 413).

Ref: inversion driver design SURVEY.md §7 step 9 (no reference counterpart).
"""

import numpy as np
import jax
import jax.numpy as jnp

from stylerenderer_tpu.face3d import mesh_point_normal, synthetic_face
from stylerenderer_tpu.inversion import (
    ProjectorConfig, make_projector, make_projector_jit,
)
from stylerenderer_tpu.models import GeneratorWithMap


def test_projector_jit_matches_closure_version():
    size, latent, B = 16, 32, 2
    gen = GeneratorWithMap(size, latent, 2)
    face, tri = synthetic_face(8, 12, 4, 3)
    x0 = face.random_input(jax.random.PRNGKey(0), B)
    v0 = face(x0)
    n0 = mesh_point_normal(v0, tri)
    g_params = jax.jit(gen.init)(
        {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)},
        [jnp.zeros((B, latent))], (v0, n0, tri),
    )["params"]

    img, _, _ = gen.apply(
        {"params": g_params},
        [jax.random.normal(jax.random.PRNGKey(3), (B, latent))],
        (v0, n0, tri), rngs={"noise": jax.random.PRNGKey(4)},
    )
    target = jnp.clip(img.astype(jnp.float32), -1, 1)

    cfg = ProjectorConfig(iters=3, w_lpips=0.0, w_lmk=0.0)
    rng = jax.random.PRNGKey(7)

    ref = jax.jit(make_projector(gen, g_params, face, tri, cfg))(rng, target)
    got = make_projector_jit(gen, face, tri, cfg)(g_params, rng, target)

    # params-as-args can change XLA fusion decisions vs baked-in constants,
    # so agreement is to f32 rounding, not bitwise
    for k in ("render", "w_plus", "face_params", "loss_history"):
        a, b = np.asarray(ref[k]), np.asarray(got[k])
        assert np.isfinite(b).all(), k
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-4, err_msg=k)


def test_projector_jit_regressor_path():
    """regressor=(apply, params) is consumed and used for w0 init."""
    size, latent, B = 16, 32, 2
    gen = GeneratorWithMap(size, latent, 2)
    face, tri = synthetic_face(8, 12, 4, 3)
    x0 = face.random_input(jax.random.PRNGKey(0), B)
    v0 = face(x0)
    n0 = mesh_point_normal(v0, tri)
    g_params = jax.jit(gen.init)(
        {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)},
        [jnp.zeros((B, latent))], (v0, n0, tri),
    )["params"]
    target = jnp.zeros((B, size, size, 3))

    reg_w = jnp.full((latent,), 0.25)

    def reg_apply(p, img):
        # trivial "encoder": mean pixel value broadcast through p
        return jnp.mean(img, axis=(1, 2, 3))[:, None] + p[None, :]

    cfg = ProjectorConfig(iters=0, w_lpips=0.0, w_lmk=0.0)
    out = make_projector_jit(
        gen, face, tri, cfg, regressor=(reg_apply, reg_w)
    )(g_params, jax.random.PRNGKey(7), target)
    # iters=0: w_plus IS the regressor init, tiled over n_latent
    w = np.asarray(out["w_plus"])
    assert w.shape == (B, gen.n_latent, latent)
    np.testing.assert_allclose(w[:, 0], np.asarray(reg_apply(reg_w, target)),
                               rtol=1e-6)
    np.testing.assert_allclose(w[:, 1:], w[:, :1].repeat(gen.n_latent - 1, 1))
