"""Model-level tests: shapes at multiple resolutions, style mixing /
truncation semantics, GAR normal-map conditioning, Discriminator/Regressor."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from stylerenderer_tpu.models import (
    Discriminator,
    Generator,
    GeneratorWithMap,
    Regressor,
)


def _mesh(batch=2, seed=0):
    """A small random-but-valid mesh in NDC."""
    rng = np.random.RandomState(seed)
    nv, nf = 32, 48
    v = (rng.rand(batch, nv, 3).astype(np.float32) * 1.4 - 0.7)
    n = rng.randn(batch, nv, 3).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    tri = rng.randint(0, nv, (nf, 3)).astype(np.int32)
    return jnp.asarray(v), jnp.asarray(n), jnp.asarray(tri)


@pytest.mark.parametrize("size", [16, 64])
def test_generator_shapes(size):
    g = Generator(size, 64, 2)
    z = jax.random.normal(jax.random.PRNGKey(0), (2, 64))
    params = g.init({"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)}, [z])
    img, lat = g.apply(
        params, [z], return_latents=True, rngs={"noise": jax.random.PRNGKey(3)}
    )
    assert img.shape == (2, size, size, 3)
    assert lat.shape == (2, g.n_latent, 64)
    assert np.isfinite(np.asarray(img)).all()


def test_generator_style_mixing_and_truncation():
    g = Generator(16, 32, 2)
    z1 = jax.random.normal(jax.random.PRNGKey(0), (2, 32))
    z2 = jax.random.normal(jax.random.PRNGKey(1), (2, 32))
    params = g.init({"params": jax.random.PRNGKey(2), "noise": jax.random.PRNGKey(3)}, [z1])
    _, lat = g.apply(
        params, [z1, z2], return_latents=True, inject_index=2,
        rngs={"noise": jax.random.PRNGKey(4)},
    )
    w1 = g.apply(params, z1, method=Generator.get_latent)
    w2 = g.apply(params, z2, method=Generator.get_latent)
    lat = np.asarray(lat)
    np.testing.assert_allclose(lat[:, 0], np.asarray(w1), rtol=1e-5)
    np.testing.assert_allclose(lat[:, 1], np.asarray(w1), rtol=1e-5)
    np.testing.assert_allclose(lat[:, 2], np.asarray(w2), rtol=1e-5)

    # truncation pulls towards the truncation latent
    t_lat = jnp.zeros((1, 32))
    _, lat_t = g.apply(
        params, [z1], return_latents=True, truncation=0.5, truncation_latent=t_lat,
        rngs={"noise": jax.random.PRNGKey(5)},
    )
    np.testing.assert_allclose(np.asarray(lat_t)[:, 0], 0.5 * np.asarray(w1), rtol=1e-5)


@pytest.mark.parametrize("size", [16, 32])
def test_gar_shapes_and_normal_pyramid(size):
    g = GeneratorWithMap(size, 48, 2)
    z = jax.random.normal(jax.random.PRNGKey(0), (2, 48))
    mesh = _mesh()
    params = g.init(
        {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)}, [z], mesh
    )
    img, lat, norms = g.apply(
        params, [z], mesh, return_latents=True, return_normals=True,
        rngs={"noise": jax.random.PRNGKey(3)},
    )
    assert img.shape == (2, size, size, 3)
    import math

    levels = int(math.log2(size)) - 1
    assert len(norms) == levels
    sizes = [m.shape[1] for m in norms]
    assert sizes == [4] + [2**i for i in range(3, int(math.log2(size)) + 1)]
    assert all(m.shape[-1] == 3 for m in norms)
    assert np.isfinite(np.asarray(img)).all()


def test_gar_mesh_changes_output():
    """The same latent with a different mesh must render differently
    (geometry conditioning is live)."""
    g = GeneratorWithMap(16, 32, 2)
    z = jax.random.normal(jax.random.PRNGKey(0), (1, 32))
    mesh_a = _mesh(1, seed=0)
    mesh_b = _mesh(1, seed=9)
    params = g.init(
        {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)}, [z], mesh_a
    )
    noise_rng = {"noise": jax.random.PRNGKey(3)}
    img_a, _, _ = g.apply(params, [z], mesh_a, rngs=noise_rng)
    img_b, _, _ = g.apply(params, [z], mesh_b, rngs=noise_rng)
    assert float(jnp.abs(img_a - img_b).max()) > 1e-4


def test_gar_downsample_pyramid_mode():
    g = GeneratorWithMap(16, 32, 2, pyramid_mode="downsample")
    z = jax.random.normal(jax.random.PRNGKey(0), (1, 32))
    mesh = _mesh(1)
    params = g.init(
        {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)}, [z], mesh
    )
    img, _, norms = g.apply(
        params, [z], mesh, return_normals=True, rngs={"noise": jax.random.PRNGKey(3)}
    )
    assert img.shape == (1, 16, 16, 3)
    assert [m.shape[1] for m in norms] == [4, 8, 16]


@pytest.mark.parametrize("size", [16, 64])
def test_discriminator(size):
    d = Discriminator(size)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, size, size, 3))
    params = d.init(jax.random.PRNGKey(1), x)
    out = d.apply(params, x)
    assert out.shape == (4, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_regressor():
    r = Regressor(32, 48, 2)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    params = r.init(jax.random.PRNGKey(1), x)
    w = r.apply(params, x)
    assert w.shape == (2, 48)
    # PixelNorm output: unit RMS
    rms = np.sqrt((np.asarray(w) ** 2).mean(-1))
    np.testing.assert_allclose(rms, 1.0, atol=1e-3)


def test_generator_grads():
    """End-to-end gradient through the GAR incl. the rasterizer."""
    g = GeneratorWithMap(16, 32, 2)
    z = jax.random.normal(jax.random.PRNGKey(0), (1, 32))
    mesh = _mesh(1)
    params = g.init(
        {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)}, [z], mesh
    )

    def loss(p, v):
        img, _, _ = g.apply(
            p, [z], (v, mesh[1], mesh[2]), rngs={"noise": jax.random.PRNGKey(3)}
        )
        return jnp.mean(img**2)

    gp, gv = jax.grad(loss, argnums=(0, 1))(params, mesh[0])
    leaves = jax.tree_util.tree_leaves(gp)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert np.isfinite(np.asarray(gv)).all()
    # geometry gradient must be non-zero (the renderer is differentiable in v)
    assert float(jnp.abs(gv).sum()) > 0


def test_stored_noise_buffers_deterministic():
    """randomize_noise=False uses the registered noise constants
    (model.py:148-153): two calls give identical images, no noise rng needed."""
    g = Generator(16, 32, 2)
    z = jax.random.normal(jax.random.PRNGKey(0), (1, 32))
    params = g.init(
        {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)}, [z]
    )
    img1, _ = g.apply(params, [z], randomize_noise=False)
    img2, _ = g.apply(params, [z], randomize_noise=False)
    np.testing.assert_array_equal(np.asarray(img1), np.asarray(img2))


def test_make_noise_shapes():
    from stylerenderer_tpu.models.generator import make_noise

    noise = make_noise(jax.random.PRNGKey(0), 32, batch=2)
    assert [n.shape[1] for n in noise] == [4, 8, 8, 16, 16, 32, 32]
    assert all(n.shape == (2, n.shape[1], n.shape[1], 1) for n in noise)


def test_conv_layer_spectral_norm_option():
    from stylerenderer_tpu.nn.layers import ConvLayer

    m = ConvLayer(6, 3, activate="sp")
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 4))
    variables = m.init(jax.random.PRNGKey(1), x)
    assert "spectral" in variables
    y, mut = m.apply(variables, x, mutable=["spectral"])
    assert y.shape == (2, 8, 8, 6)
    assert np.isfinite(np.asarray(y)).all()
