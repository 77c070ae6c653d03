"""Pallas tile-kernel winner search vs the dense oracle — run in interpreter
mode on CPU (the TPU-compiled kernel is exercised by bench.py on hardware)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

import stylerenderer_tpu.ops.rasterize_pallas as rp
from stylerenderer_tpu.ops.rasterize import rasterize_winners


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(rp.pl, "pallas_call", patched)
    yield


@pytest.mark.parametrize("perspective", [False, True])
def test_matches_dense_random(perspective):
    rng = np.random.RandomState(0)
    nv, nf, B, h = 40, 120, 2, 24
    v = rng.randn(B, nv, 3).astype(np.float32) * 0.5
    if perspective:
        v[:, :, 2] -= 3.0
    tri = rng.randint(0, nv, (nf, 3)).astype(np.int32)
    dense = np.asarray(
        rasterize_winners(jnp.asarray(v), jnp.asarray(tri), h, h, perspective)
    )
    pall = np.asarray(
        rp.rasterize_winners_pallas(jnp.asarray(v), jnp.asarray(tri), h, h,
                                    perspective)
    )
    np.testing.assert_array_equal(dense, pall)


def test_matches_dense_sphere():
    from stylerenderer_tpu.face3d import synthetic_face

    face, tri = synthetic_face(16, 32, 6, 3)
    v = face(face.random_input(jax.random.PRNGKey(0), 2))
    dense = np.asarray(rasterize_winners(v, tri, 32, 32))
    pall = np.asarray(rp.rasterize_winners_pallas(v, tri, 32, 32))
    np.testing.assert_array_equal(dense, pall)
    assert (pall >= 0).mean() > 0.2


def test_tier_routing_big_triangles():
    # image-filling triangle (XL tier) + small one (A tier)
    v = np.asarray(
        [[[-1, -1, 0.0], [-1, 1, 0], [1, 0, 0],
          [-0.05, -0.05, 0.5], [-0.05, 0.05, 0.5], [0.05, 0, 0.5]]],
        np.float32,
    )
    tri = np.asarray([[2, 1, 0], [5, 4, 3]], np.int32)
    h = 32
    dense = np.asarray(rasterize_winners(jnp.asarray(v), jnp.asarray(tri), h, h))
    pall = np.asarray(
        rp.rasterize_winners_pallas(jnp.asarray(v), jnp.asarray(tri), h, h)
    )
    np.testing.assert_array_equal(dense, pall)
    assert {0, 1} <= set(pall.reshape(-1))


def test_overflow_diagnostic():
    rng = np.random.RandomState(1)
    v = jnp.asarray(rng.randn(1, 30, 3).astype(np.float32) * 0.5)
    tri = jnp.asarray(rng.randint(0, 30, (50, 3)).astype(np.int32))
    ovf = np.asarray(rp.bin_overflow(v, tri, 32, 32))
    assert ovf.shape == (1, 3)
    assert (ovf == 0).all()
