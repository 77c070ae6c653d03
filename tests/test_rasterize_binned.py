"""Binned winner search must match the dense search exactly (same candidate
math, deterministic min-id ties) across mesh scales, including meshes with
big triangles routed to the dense top-K pass."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from stylerenderer_tpu.ops.rasterize import rasterize_winners
from stylerenderer_tpu.ops.rasterize_binned import (
    big_overflow_count,
    rasterize_winners_binned,
)


@pytest.mark.parametrize("perspective", [False, True])
@pytest.mark.parametrize("seed", [0, 1])
def test_matches_dense_random_mesh(perspective, seed):
    rng = np.random.RandomState(seed)
    nv, nf, B, h = 40, 120, 2, 24
    v = rng.randn(B, nv, 3).astype(np.float32) * 0.5
    if perspective:
        v[:, :, 2] -= 3.0
    tri = rng.randint(0, nv, (nf, 3)).astype(np.int32)
    dense = np.asarray(rasterize_winners(jnp.asarray(v), jnp.asarray(tri), h, h,
                                         perspective))
    binned = np.asarray(
        rasterize_winners_binned(jnp.asarray(v), jnp.asarray(tri), h, h,
                                 perspective, k_list=(4, 8), big_cap=64)
    )
    np.testing.assert_array_equal(dense, binned)


def test_matches_dense_sphere_mesh():
    from stylerenderer_tpu.face3d import mesh_point_normal, synthetic_face

    face, tri = synthetic_face(16, 32, 6, 3)
    x = face.random_input(jax.random.PRNGKey(0), 2)
    v = face(x)
    h = 32
    dense = np.asarray(rasterize_winners(v, tri, h, h))
    binned = np.asarray(rasterize_winners_binned(v, tri, h, h))
    np.testing.assert_array_equal(dense, binned)
    # coverage is substantial (sphere fills the frame)
    assert (np.asarray(binned) >= 0).mean() > 0.2


def test_big_triangle_routed_to_dense_pass():
    # one image-filling triangle + small ones
    v = np.asarray(
        [[[-1, -1, 0.0], [-1, 1, 0], [1, 0, 0],
          [-0.1, -0.1, 0.5], [-0.1, 0.1, 0.5], [0.1, 0, 0.5]]],
        np.float32,
    )
    tri = np.asarray([[2, 1, 0], [5, 4, 3]], np.int32)
    h = 16
    dense = np.asarray(rasterize_winners(jnp.asarray(v), jnp.asarray(tri), h, h))
    binned = np.asarray(
        rasterize_winners_binned(jnp.asarray(v), jnp.asarray(tri), h, h,
                                 k_list=(4,), big_cap=4)
    )
    np.testing.assert_array_equal(dense, binned)
    # the small triangle (id 1, z=0.5 closer... camera looks at max z)
    assert 1 in set(binned.reshape(-1)) and 0 in set(binned.reshape(-1))
    n_big = np.asarray(big_overflow_count(jnp.asarray(v), tri, h, h, k_list=(4,)))
    assert n_big[0] == 1


def test_empty_and_degenerate():
    v = jnp.zeros((1, 3, 3))
    tri = jnp.asarray([[0, 1, 2]], jnp.int32)
    win = rasterize_winners_binned(v, tri, 8, 8)
    dense = rasterize_winners(v, tri, 8, 8)
    np.testing.assert_array_equal(np.asarray(win), np.asarray(dense))
