"""Inversion (render inverting) tests: the scanned optimizer must reduce the
reconstruction loss and recover a target rendered by the same generator."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from stylerenderer_tpu.face3d import mesh_point_normal, synthetic_face
from stylerenderer_tpu.inversion import ProjectorConfig, make_projector
from stylerenderer_tpu.models import GeneratorWithMap


@pytest.fixture(scope="module")
def setup():
    gen = GeneratorWithMap(16, 32, 2, channel_multiplier=1)
    face, tri = synthetic_face(8, 16, shape_dim=4, expression_dim=2)
    z = jax.random.normal(jax.random.PRNGKey(0), (1, 32))
    x = face.random_input(jax.random.PRNGKey(1), 1)
    v = face(x)
    n = mesh_point_normal(v, tri)
    variables = gen.init(
        {"params": jax.random.PRNGKey(2), "noise": jax.random.PRNGKey(3)},
        [z], (v, n, tri),
    )
    return gen, variables["params"], face, tri


def test_projection_reduces_loss(setup):
    gen, params, face, tri = setup
    # target: a render from the same generator (self-reconstruction)
    rng = jax.random.PRNGKey(7)
    xt = face.random_input(jax.random.PRNGKey(8), 1)
    vt = face(xt)
    nt = mesh_point_normal(vt, tri)
    zt = jax.random.normal(jax.random.PRNGKey(9), (1, 32))
    noise = [jnp.zeros((1, 1, 1, 1))] * gen.num_layers
    target, _, _ = gen.apply(
        {"params": params}, [zt], (vt, nt, tri), noise=noise
    )

    cfg = ProjectorConfig(iters=40, lr=0.1, lr_geom=0.02, w_lpips=0.0,
                          w_prior=1e-5)
    project = jax.jit(make_projector(gen, params, face, tri, cfg))
    out = project(rng, target)
    hist = np.asarray(out["loss_history"])
    assert np.isfinite(hist).all()
    # optimization makes clear progress
    assert hist[-1] < hist[0] * 0.7, (hist[0], hist[-1])
    assert out["render"].shape == target.shape
    # final pixel error small-ish for self-reconstruction
    mse = float(jnp.mean((out["render"] - target) ** 2))
    assert mse < float(jnp.mean(target**2))


def test_projection_with_landmarks(setup):
    gen, params, face, tri = setup
    lmk_vidx = jnp.asarray([0, 5, 17, 33], jnp.int32)
    target = jnp.zeros((1, 16, 16, 3))
    target_lmk = jnp.asarray([[[4.0, 4.0], [8, 8], [12, 12], [6, 10]]])
    cfg = ProjectorConfig(iters=10, w_lpips=0.0, w_lmk=1e-2)
    project = jax.jit(
        make_projector(gen, params, face, tri, cfg, lmk_vidx=lmk_vidx)
    )
    out = project(jax.random.PRNGKey(0), target, target_lmk)
    assert np.isfinite(np.asarray(out["loss_history"])).all()
    assert "lmk" in out["losses"]


def test_segmented_fit_matches_single_dispatch(setup):
    """fit_segmented (the ~60 s dispatch-cap workaround, round 5) must
    reproduce the single-dispatch Adam trajectory: same rng-derived init,
    (params, opt_state) carried across host segments, loss histories
    concatenated — results bitwise-equal on CPU."""
    from stylerenderer_tpu.inversion.project import fit_segmented

    gen, params, face, tri = setup
    target = jnp.zeros((1, 16, 16, 3))
    cfg = ProjectorConfig(iters=12, lr=0.1, lr_geom=0.02, w_lpips=0.0,
                          w_prior=1e-5)
    project = jax.jit(
        make_projector(gen, params, face, tri, cfg),
        static_argnames=("n_steps", "return_state"),
    )
    rng = jax.random.PRNGKey(11)
    ref = project(rng, target)
    seg = fit_segmented(project, rng, target, iters=12, segments=3)
    assert "state" not in seg
    np.testing.assert_array_equal(np.asarray(seg["loss_history"]),
                                  np.asarray(ref["loss_history"]))
    for k in ("w_plus", "face_params", "rvec", "tvec", "log_scale",
              "render"):
        np.testing.assert_array_equal(np.asarray(seg[k]),
                                      np.asarray(ref[k]), err_msg=k)
