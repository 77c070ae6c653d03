import numpy as np
import jax
import jax.numpy as jnp

from stylerenderer_tpu.ops.fused_act import fused_leaky_relu, scaled_leaky_relu, SQRT2


def test_matches_definition():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 5, 5, 4).astype(np.float32)
    b = rng.randn(4).astype(np.float32)
    got = np.asarray(fused_leaky_relu(jnp.asarray(x), jnp.asarray(b)))
    y = x + b.reshape(1, 1, 1, 4)
    want = np.where(y >= 0, y, 0.2 * y) * np.sqrt(2)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_matches_torch():
    import torch
    import torch.nn.functional as F

    rng = np.random.RandomState(1)
    x = rng.randn(2, 3, 4, 4).astype(np.float32)  # torch NCHW
    b = rng.randn(3).astype(np.float32)
    want = (
        F.leaky_relu(torch.from_numpy(x) + torch.from_numpy(b).view(1, 3, 1, 1), 0.2)
        * np.sqrt(2)
    ).numpy()
    got = np.asarray(
        fused_leaky_relu(jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(b))
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_grads_match_reference_formula():
    """Reference backward: grad_in = lrelu'(out-sign) * scale; second grad of
    the sign term is 0 (fused_bias_act_kernel.cu:38)."""
    x = jnp.asarray(np.random.RandomState(2).randn(8).astype(np.float32))
    b = jnp.zeros((8,), jnp.float32)

    g = jax.grad(lambda x_: jnp.sum(fused_leaky_relu(x_, b)))(x)
    want = np.where(np.asarray(x) >= 0, 1.0, 0.2) * np.sqrt(2)
    np.testing.assert_allclose(np.asarray(g), want, rtol=1e-6)

    gg = jax.grad(lambda x_: jnp.sum(jax.grad(
        lambda y: jnp.sum(fused_leaky_relu(y, b) ** 2))(x_)))(x)
    assert np.isfinite(np.asarray(gg)).all()


def test_scaled_leaky_relu():
    x = jnp.asarray([-1.0, 2.0])
    np.testing.assert_allclose(
        np.asarray(scaled_leaky_relu(x)), [-0.2 * SQRT2, 2 * SQRT2], rtol=1e-6
    )
