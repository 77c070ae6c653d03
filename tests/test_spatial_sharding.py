"""Spatial (batch x height) sharding headroom: the discriminator and GAR
forward must produce identical results when feature maps are sharded over a
2x4 (data, space) mesh — XLA GSPMD inserts the conv halo exchanges."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from stylerenderer_tpu.models import Discriminator, GeneratorWithMap
from stylerenderer_tpu.parallel import replicated
from stylerenderer_tpu.parallel.mesh import image_sharding, make_mesh_2d


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_discriminator_spatial_sharding_matches():
    mesh = make_mesh_2d(2, 4)
    d = Discriminator(32, channel_multiplier=1)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 32, 32, 3))
    params = d.init(jax.random.PRNGKey(1), x)

    out_single = d.apply(params, x)

    x_sharded = jax.device_put(x, image_sharding(mesh))
    params_rep = jax.device_put(params, replicated(mesh))
    with mesh:
        out_sharded = jax.jit(d.apply)(params_rep, x_sharded)
    np.testing.assert_allclose(
        np.asarray(out_single), np.asarray(out_sharded), rtol=1e-4, atol=1e-5
    )


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_gar_forward_spatial_sharding_matches():
    from stylerenderer_tpu.face3d import mesh_point_normal, synthetic_face

    mesh2d = make_mesh_2d(2, 4)
    g = GeneratorWithMap(16, 32, 2, channel_multiplier=1)
    face, tri = synthetic_face(6, 12, 4, 2)
    xf = face.random_input(jax.random.PRNGKey(0), 4)
    v = face(xf)
    n = mesh_point_normal(v, tri)
    z = jax.random.normal(jax.random.PRNGKey(1), (4, 32))
    params = g.init(
        {"params": jax.random.PRNGKey(2), "noise": jax.random.PRNGKey(3)},
        [z], (v, n, tri),
    )
    noise = [jnp.zeros((1, 1, 1, 1))] * g.num_layers
    img_single, _, _ = g.apply(params, [z], (v, n, tri), noise=noise)

    from jax.sharding import NamedSharding, PartitionSpec as P

    params_rep = jax.device_put(params, replicated(mesh2d))
    batch_sh = NamedSharding(mesh2d, P("data"))
    z_s = jax.device_put(z, batch_sh)
    v_s = jax.device_put(v, batch_sh)
    n_s = jax.device_put(n, batch_sh)

    def fwd(p, z, v, n):
        img, _, _ = g.apply(p, [z], (v, n, tri), noise=noise)
        # ask GSPMD to spatially shard the output feature map
        return jax.lax.with_sharding_constraint(
            img, NamedSharding(mesh2d, P("data", "space"))
        )

    with mesh2d:
        img_sharded = jax.jit(fwd)(params_rep, z_s, v_s, n_s)
    np.testing.assert_allclose(
        np.asarray(img_single), np.asarray(img_sharded), rtol=1e-4, atol=1e-5
    )
