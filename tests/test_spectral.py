"""Spectral norm / dominant singular pair / Normalize-variant tests."""

import numpy as np
import jax
import jax.numpy as jnp

from stylerenderer_tpu.nn.spectral import (
    SpectralNorm,
    batch_eigen_max,
    normalize_vec,
    spectral_sigma_exact,
)


def test_batch_eigen_max_matches_numpy():
    rng = np.random.RandomState(0)
    A = rng.randn(3, 5, 7).astype(np.float32)
    u, s = batch_eigen_max(jnp.asarray(A))
    for b in range(3):
        _, sv, _ = np.linalg.svd(A[b])
        np.testing.assert_allclose(float(s[b]), sv[0], rtol=1e-4)
        # u is the top left-singular vector up to the sign convention
        uu = np.linalg.svd(A[b])[0][:, 0]
        if uu[-1] < 0:
            uu = -uu
        np.testing.assert_allclose(np.asarray(u[b]), uu, rtol=1e-3, atol=1e-4)


def test_spectral_sigma_exact():
    rng = np.random.RandomState(1)
    w = rng.randn(6, 4, 3, 3).astype(np.float32)
    sig = float(spectral_sigma_exact(jnp.asarray(w)))
    want = np.linalg.svd(w.reshape(6, -1))[1][0]
    np.testing.assert_allclose(sig, want, rtol=1e-4)


def test_normalize_variants():
    v = jnp.asarray([[3.0, -4.0, 0.0]])
    np.testing.assert_allclose(
        np.asarray(normalize_vec(v, kind="L2")), [[0.6, -0.8, 0.0]], rtol=1e-6
    )
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(normalize_vec(v, kind="LINF")), np.inf, -1), 1.0,
        rtol=1e-6,
    )
    l1 = normalize_vec(jnp.asarray([[1.0, 2.0, 5.0]]), kind="L1")
    np.testing.assert_allclose(np.asarray(l1).sum(), 1.0, rtol=1e-6)


def test_spectral_norm_module_unit_sigma():
    """After normalization the weight's top singular value is ~1 (power
    iteration converges over repeated applications)."""
    sn = SpectralNorm(8, (8, 16), power_iterations=3)

    def apply_fn(w, x):
        return x @ w.reshape(8, 16)

    x = jnp.ones((2, 8))
    variables = sn.init({"params": jax.random.PRNGKey(0)}, apply_fn, x)
    state = variables
    for _ in range(20):
        y, mut = sn.apply(state, apply_fn, x, mutable=["spectral"])
        state = {"params": state["params"], "spectral": mut["spectral"]}
    w = np.asarray(state["params"]["weight_bar"]).reshape(8, 16)
    u = np.asarray(state["spectral"]["u"])
    v = np.asarray(state["spectral"]["v"])
    sigma_est = u @ w @ v
    sigma_true = np.linalg.svd(w)[1][0]
    np.testing.assert_allclose(sigma_est, sigma_true, rtol=1e-3)

    # exact mode normalizes in one shot
    sn0 = SpectralNorm(8, (8, 16), power_iterations=0)
    vars0 = sn0.init({"params": jax.random.PRNGKey(1)}, apply_fn, x)
    w0 = np.asarray(vars0["params"]["weight_bar"]).reshape(8, 16)
    y = sn0.apply(vars0, lambda w, x: w.reshape(8, 16), x)
    np.testing.assert_allclose(np.linalg.svd(np.asarray(y))[1][0], 1.0, rtol=1e-4)
