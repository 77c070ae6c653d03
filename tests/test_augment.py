"""ADA augmentation tests: color matrix properties, geometric warp border
safety, per-sample gating, camera-matrix branch."""

import numpy as np
import jax
import jax.numpy as jnp

from stylerenderer_tpu.face3d.augment import (
    ada_augment,
    apply_color,
    random_color_matrix,
    random_pose2d,
    random_pose2d_cam,
)


def test_color_matrix_identity_when_p_zero():
    C = random_color_matrix(jax.random.PRNGKey(0), 4, p=(0, 0, 0, 0, 0))
    want = np.tile(np.concatenate([np.eye(3), np.zeros((3, 1))], 1), (4, 1, 1))
    np.testing.assert_allclose(np.asarray(C), want, atol=1e-6)


def test_color_preserves_gray_axis_under_hue():
    """Hue rotation is about the gray axis: gray pixels are fixed points."""
    C = random_color_matrix(jax.random.PRNGKey(1), 8, p=(0, 0, 0, 0.5, 0))
    img = jnp.ones((8, 2, 2, 3)) * 0.37
    out = apply_color(img, C)
    np.testing.assert_allclose(np.asarray(out), 0.37, atol=1e-5)


def test_pose2d_identity_when_p_zero():
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(2, 16, 16, 3).astype(np.float32))
    out = random_pose2d(jax.random.PRNGKey(0), img, p=(0, 0, 0, 0, 0, 0))
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-4)


def test_pose2d_border_safe():
    """The min-zoom corner logic keeps samples inside: a constant image
    stays (almost) constant — no zero borders leak in."""
    img = jnp.ones((4, 32, 32, 3))
    out = random_pose2d(jax.random.PRNGKey(1), img, p=(0.2, 0.2, 0.3, 0.2, 0, 0.5))
    assert float(jnp.min(out)) > 0.95, float(jnp.min(out))


def test_ada_gating():
    img = jnp.zeros((16, 8, 8, 3))
    out0 = ada_augment(jax.random.PRNGKey(0), img, 0.0)
    np.testing.assert_array_equal(np.asarray(out0), np.asarray(img))
    # p=1: always augmented (color shifts move pixels off zero w.h.p.)
    out1 = ada_augment(jax.random.PRNGKey(1), img, 1.0)
    assert float(jnp.abs(out1).max()) > 0


def test_pose2d_cam_identity_and_flip():
    cam = jnp.asarray(
        [[[100.0, 0, 0.5], [0, 100.0, 0.5], [0, 0, 1.0]]]
    )  # normalized principal point
    out = random_pose2d_cam(jax.random.PRNGKey(0), cam, p=(0, 0, 0, 0, 0, 0),
                            in_size=256, out_size=256)
    # wait: focal 100 with normalized pp mixes conventions; use normalized
    cam_n = jnp.asarray([[[1.2, 0, 0.5], [0, 1.2, 0.5], [0, 0, 1.0]]])
    out = random_pose2d_cam(jax.random.PRNGKey(0), cam_n, p=(0, 0, 0, 0, 0, 0),
                            in_size=256, out_size=256)
    np.testing.assert_allclose(np.asarray(out), np.asarray(cam_n), atol=1e-5)
    # guaranteed flip mirrors the principal point
    out_f = random_pose2d_cam(jax.random.PRNGKey(0), cam_n,
                              p=(0, 0, 0, 0, 0, 1.0), in_size=256, out_size=256)
    np.testing.assert_allclose(float(out_f[0, 0, 2]), 0.5, atol=1e-5)
    cam_off = cam_n.at[0, 0, 2].set(0.3)
    out_f2 = random_pose2d_cam(jax.random.PRNGKey(0), cam_off,
                               p=(0, 0, 0, 0, 0, 1.0), in_size=256, out_size=256)
    np.testing.assert_allclose(float(out_f2[0, 0, 2]), 0.7, atol=1e-5)
