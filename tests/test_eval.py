"""Eval tests: Fréchet distance closed forms, inception shapes + FID patch
behavior, LPIPS properties + published linear-head loading, slerp math."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from stylerenderer_tpu.eval import (
    LPIPS,
    compute_fid,
    feature_stats,
    frechet_distance,
    load_lpips,
    load_patched_inception_v3,
    lerp,
    ppl_filtered_mean,
    slerp,
)


def test_frechet_identical_is_zero():
    rng = np.random.RandomState(0)
    f = rng.randn(500, 16)
    mu, cov = feature_stats(f)
    assert abs(frechet_distance(mu, cov, mu, cov)) < 1e-6


def test_frechet_mean_shift_closed_form():
    """Same cov, shifted mean: d² = ||Δmu||²."""
    rng = np.random.RandomState(1)
    f = rng.randn(2000, 8)
    mu, cov = feature_stats(f)
    delta = np.arange(8) * 0.1
    d = frechet_distance(mu, cov, mu + delta, cov)
    np.testing.assert_allclose(d, float(np.sum(delta**2)), rtol=1e-4, atol=1e-6)


def test_frechet_isotropic_closed_form():
    """N(0, a²I) vs N(0, b²I): d² = D·(a-b)²."""
    D, a, b = 6, 1.0, 2.0
    mu = np.zeros(D)
    d = frechet_distance(mu, np.eye(D) * a**2, mu, np.eye(D) * b**2)
    np.testing.assert_allclose(d, D * (a - b) ** 2, rtol=1e-5)


def test_compute_fid_sanity():
    rng = np.random.RandomState(2)
    real = rng.randn(800, 12)
    mu, cov = feature_stats(real)
    near = compute_fid(rng.randn(800, 12), mu, cov)
    far = compute_fid(rng.randn(800, 12) * 3 + 1, mu, cov)
    assert near < far


def test_inception_shapes_and_determinism():
    model, params = load_patched_inception_v3()
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 3))
    f = model.apply({"params": params}, x)
    assert f.shape == (2, 2048)
    f2 = model.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(f), np.asarray(f2))
    # different inputs -> different features
    y = model.apply({"params": params}, -x)
    assert float(jnp.abs(f - y).max()) > 0


def test_lpips_properties():
    apply_fn, params = load_lpips("vgg")
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 3)) * 0.5
    y = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3)) * 0.5
    d_same = np.asarray(apply_fn(params, x, x))
    d_diff = np.asarray(apply_fn(params, x, y))
    np.testing.assert_allclose(d_same, 0.0, atol=1e-6)
    assert (d_diff > 0).all()
    # symmetric
    d_ba = np.asarray(apply_fn(params, y, x))
    np.testing.assert_allclose(d_diff, d_ba, rtol=1e-5)


def test_lpips_grad_finite_on_flat_images():
    """Inversion differentiates THROUGH lpips: the unit-normalize gradient
    must be finite even where a ReLU feature vector is exactly zero (flat /
    all-background images are the adversarial case — the reference's
    sqrt(sum f^2)+eps form NaNs there)."""
    apply_fn, params = load_lpips("vgg")
    target = jnp.zeros((1, 64, 64, 3))

    def loss(img):
        return jnp.mean(apply_fn(params, img, target))

    for img in (jnp.zeros((1, 64, 64, 3)), -jnp.ones((1, 64, 64, 3))):
        g = jax.grad(loss)(img)
        assert np.isfinite(np.asarray(g)).all()


def test_lpips_published_linear_heads_load():
    import os

    path = "/root/reference/lpips/weights/v0.1/vgg.pth"
    if not os.path.exists(path):
        pytest.skip("published LPIPS heads not present")
    apply_fn, params = load_lpips("vgg", linear_weights=path)
    # heads must be the published ones: non-uniform, non-negative-dominated
    w0 = np.asarray(params["lin0"])
    assert w0.shape == (64,)
    assert w0.std() > 0  # not the constant init


def test_slerp_properties():
    a = jnp.asarray([[1.0, 0.0]])
    b = jnp.asarray([[0.0, 1.0]])
    mid = np.asarray(slerp(a, b, jnp.asarray([[0.5]])))[0]
    np.testing.assert_allclose(mid, [np.cos(np.pi / 4), np.sin(np.pi / 4)], rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(slerp(a, b, jnp.asarray([[0.0]])))[0], [1, 0], atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(slerp(a, b, jnp.asarray([[1.0]])))[0], [0, 1], atol=1e-6
    )
    # norm interpolates linearly
    a2, b2 = a * 2, b * 4
    v = np.asarray(slerp(a2, b2, jnp.asarray([[0.5]])))[0]
    np.testing.assert_allclose(np.linalg.norm(v), 3.0, rtol=1e-5)


def test_lerp_and_percentile_filter():
    np.testing.assert_allclose(float(lerp(1.0, 3.0, 0.25)), 1.5)
    d = np.concatenate([np.ones(98), [1000.0], [-1000.0]])
    m = ppl_filtered_mean(d)
    np.testing.assert_allclose(m, 1.0, atol=1e-6)
