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


def test_degenerate_routed_to_xl():
    # degenerate triangles (repeated vertex -> segment; all-same -> point)
    # must still rasterize: build_bins routes them to the XL tier where the
    # full fallback math runs. Coverage needs pixel centers EXACTLY on the
    # segment/point (eps=1e-6), so place them on the h=16 pixel lattice:
    # py = (1-y)*8-0.5 = 7  <=>  y = 0.0625; px = (1+x)*8-0.5.
    h = 16
    y_row = 1.0 - 7.5 / 8.0          # row of pixel centers at py=7
    x_pt = (12 + 0.5) / 8.0 - 1.0    # px=12
    y_pt = 1.0 - 3.5 / 8.0           # py=3
    v = np.asarray(
        [[[-0.6, -0.6, 0.0], [0.6, -0.6, 0.0], [0.0, 0.6, 0.0],   # normal
          [-0.5, y_row, 0.5], [0.5, y_row, 0.5],                  # segment
          [x_pt, y_pt, 0.9]]],                                    # point
        np.float32,
    )
    tri = np.asarray(
        [[2, 1, 0], [3, 4, 4], [5, 5, 5]], np.int32
    )
    dense = np.asarray(rasterize_winners(jnp.asarray(v), jnp.asarray(tri), h, h))
    pall = np.asarray(
        rp.rasterize_winners_pallas(jnp.asarray(v), jnp.asarray(tri), h, h)
    )
    np.testing.assert_array_equal(dense, pall)
    covered = set(pall.reshape(-1))
    assert 1 in covered  # the segment won pixels (in front of triangle 0)
    assert 2 in covered  # the point won its pixel


def test_adaptive_tile_16(monkeypatch):
    # force the >256px tile size on a small image to exercise that path
    monkeypatch.setattr(rp, "_tile_for", lambda h, w: 16)
    rng = np.random.RandomState(2)
    v = jnp.asarray(rng.randn(2, 40, 3).astype(np.float32) * 0.5)
    tri = jnp.asarray(rng.randint(0, 40, (120, 3)).astype(np.int32))
    dense = np.asarray(rasterize_winners(v, tri, 32, 32))
    pall = np.asarray(rp.rasterize_winners_pallas(v, tri, 32, 32))
    np.testing.assert_array_equal(dense, pall)


@pytest.mark.parametrize("perspective", [False, True])
def test_multi_level_matches_dense(perspective):
    """One multi-level pass == the dense oracle at EVERY pyramid level."""
    rng = np.random.RandomState(3)
    nv, nf, B, top = 50, 160, 2, 32
    v = rng.randn(B, nv, 3).astype(np.float32) * 0.6
    if perspective:
        v[:, :, 2] -= 3.0
    tri = rng.randint(0, nv, (nf, 3)).astype(np.int32)
    outs = rp.rasterize_winners_pallas_multi(
        jnp.asarray(v), jnp.asarray(tri), top, 5, perspective
    )
    assert len(outs) == 5
    for k, win in enumerate(outs):
        s = top >> k
        dense = np.asarray(
            rasterize_winners(jnp.asarray(v), jnp.asarray(tri), s, s,
                              perspective)
        )
        np.testing.assert_array_equal(dense, np.asarray(win), err_msg=f"level {s}")


def test_multi_level_sphere_pyramid():
    from stylerenderer_tpu.face3d import synthetic_face

    face, tri = synthetic_face(16, 32, 6, 3)
    v = face(face.random_input(jax.random.PRNGKey(5), 2))
    outs = rp.rasterize_winners_pallas_multi(v, tri, 32, 4)
    for k, win in enumerate(outs):
        s = 32 >> k
        dense = np.asarray(rasterize_winners(v, tri, s, s))
        np.testing.assert_array_equal(dense, np.asarray(win), err_msg=f"level {s}")
    assert (np.asarray(outs[0]) >= 0).mean() > 0.2


@pytest.mark.parametrize("attrs_mode", [False, True])
def test_multi_level_tail_kernel(attrs_mode):
    """Levels below 1 px/tile (the 8/4 px pyramid tail) run in the second
    single-tile pass over the same binned data — winner maps must stay
    bit-identical to the dense oracle, fused values within f32 rounding.
    top=128 with tile 16 -> 5 tiled levels + 1 tail level (4 px)."""
    from stylerenderer_tpu.ops.rasterize import rasterize

    rng = np.random.RandomState(13)
    nv, nf, B, top = 60, 200, 2, 128
    v = jnp.asarray(rng.randn(B, nv, 3).astype(np.float32) * 0.6)
    tri = jnp.asarray(rng.randint(0, nv, (nf, 3)).astype(np.int32))
    if attrs_mode:
        attrs = jnp.asarray(rng.randn(B, nv, 3).astype(np.float32))
        outs = rp.rasterize_winners_pallas_multi(v, tri, top, 6, attrs=attrs)
    else:
        outs = rp.rasterize_winners_pallas_multi(v, tri, top, 6)
    assert len(outs) == 6
    for k, out in enumerate(outs):
        s = top >> k
        dense_win = np.asarray(rasterize_winners(v, tri, s, s))
        if attrs_mode:
            m, win = out
            ref = np.asarray(rasterize(v, attrs, tri, s, s))
            np.testing.assert_allclose(np.asarray(m), ref, rtol=1e-4,
                                       atol=2e-5, err_msg=f"level {s}")
            np.testing.assert_array_equal(np.asarray(win), dense_win,
                                          err_msg=f"win level {s}")
        else:
            np.testing.assert_array_equal(np.asarray(out), dense_win,
                                          err_msg=f"level {s}")


def test_rasterize_pyramid_matches_per_level():
    """rasterize_pyramid (one multi-level pass) == per-size rasterize, values
    AND gradients (the generator's normal-map pyramid contract)."""
    from stylerenderer_tpu.face3d import mesh_point_normal, synthetic_face
    from stylerenderer_tpu.ops.rasterize import rasterize, rasterize_pyramid

    face, tri = synthetic_face(12, 24, 4, 2)
    v = face(face.random_input(jax.random.PRNGKey(7), 2))
    n = mesh_point_normal(v, tri)
    sizes = [4, 8, 16, 32]
    pyr = rasterize_pyramid(v, n, tri, sizes, method="pallas_multi")
    for s, m in zip(sizes, pyr):
        ref = rasterize(v, n, tri, s, s)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(m),
                                      err_msg=f"size {s}")

    def loss_pyr(v_, n_):
        return sum(jnp.sum(m ** 2) for m in
                   rasterize_pyramid(v_, n_, tri, sizes, method="pallas_multi"))

    def loss_ref(v_, n_):
        return sum(jnp.sum(rasterize(v_, n_, tri, s, s) ** 2) for s in sizes)

    gv_a, gn_a = jax.grad(loss_pyr, argnums=(0, 1))(v, n)
    gv_b, gn_b = jax.grad(loss_ref, argnums=(0, 1))(v, n)
    # pyramid shares ONE triangle table across levels, so level cotangents
    # sum into table rows before the single scatter-add back to vertices;
    # per-level rasterize scatter-adds each level separately — same math,
    # different fp32 association (observed <=8e-6 rel on 0.2% of elements)
    np.testing.assert_allclose(np.asarray(gv_a), np.asarray(gv_b),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gn_a), np.asarray(gn_b),
                               rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("perspective", [False, True])
def test_fused_attrs_match_interp(perspective):
    """Fused in-kernel interpolation == winner map + JAX interp, every level."""
    from stylerenderer_tpu.ops.rasterize import rasterize

    rng = np.random.RandomState(11)
    nv, nf, B, top = 50, 160, 2, 32
    v = rng.randn(B, nv, 3).astype(np.float32) * 0.6
    if perspective:
        v[:, :, 2] -= 3.0
    tri = rng.randint(0, nv, (nf, 3)).astype(np.int32)
    attrs = rng.randn(B, nv, 3).astype(np.float32)
    outs = rp.rasterize_winners_pallas_multi(
        jnp.asarray(v), jnp.asarray(tri), top, 5, perspective,
        attrs=jnp.asarray(attrs),
    )
    assert len(outs) == 5
    for k, (m, win) in enumerate(outs):
        s = top >> k
        ref = np.asarray(
            rasterize(jnp.asarray(v), jnp.asarray(attrs), jnp.asarray(tri),
                      s, s, perspective)
        )
        np.testing.assert_allclose(np.asarray(m), ref, rtol=1e-4, atol=2e-5,
                                   err_msg=f"level {s}")
        dense_win = np.asarray(
            rasterize_winners(jnp.asarray(v), jnp.asarray(tri), s, s,
                              perspective)
        )
        np.testing.assert_array_equal(np.asarray(win), dense_win,
                                      err_msg=f"win level {s}")


def test_fused_attrs_degenerate_and_xl():
    """Fused mode handles XL-tier (huge + degenerate) triangles identically."""
    from stylerenderer_tpu.ops.rasterize import rasterize

    h = 16
    y_row = 1.0 - 7.5 / 8.0
    v = np.asarray(
        [[[-1, -1, 0.0], [-1, 1, 0], [1, 0, 0],        # image-filling
          [-0.5, y_row, 0.5], [0.5, y_row, 0.5]]],     # degenerate segment
        np.float32,
    )
    tri = np.asarray([[2, 1, 0], [3, 4, 4]], np.int32)
    attrs = np.asarray(
        [[[1, 0, 0], [0, 1, 0], [0, 0, 1], [0.5, 0.5, 0], [0, 0.5, 0.5]]],
        np.float32,
    )
    outs = rp.rasterize_winners_pallas_multi(
        jnp.asarray(v), jnp.asarray(tri), h, 2, attrs=jnp.asarray(attrs)
    )
    for k, (m, _) in enumerate(outs):
        s = h >> k
        ref = np.asarray(rasterize(jnp.asarray(v), jnp.asarray(attrs),
                                   jnp.asarray(tri), s, s))
        np.testing.assert_allclose(np.asarray(m), ref, rtol=1e-4, atol=2e-5,
                                   err_msg=f"level {s}")


def test_rasterize_pyramid_fused_matches():
    """rasterize_pyramid_fused == rasterize_pyramid: values to f32 rounding
    AND gradients exactly (the custom VJP recomputes the same
    interpolation-only gradients from the saved winner maps)."""
    from stylerenderer_tpu.face3d import mesh_point_normal, synthetic_face
    from stylerenderer_tpu.ops.rasterize import (
        rasterize_pyramid, rasterize_pyramid_fused,
    )

    face, tri = synthetic_face(12, 24, 4, 2)
    v = face(face.random_input(jax.random.PRNGKey(7), 2))
    n = mesh_point_normal(v, tri)
    sizes = [4, 8, 16, 32]
    a = rasterize_pyramid(v, n, tri, sizes, method="pallas_multi")
    b = rasterize_pyramid_fused(v, n, tri, sizes, method="pallas_multi")
    for s, ma, mb in zip(sizes, a, b):
        np.testing.assert_allclose(np.asarray(ma), np.asarray(mb),
                                   rtol=1e-4, atol=2e-5, err_msg=f"size {s}")

    def loss(fn):
        def f(v_, n_):
            return sum(jnp.sum(m ** 2) for m in
                       fn(v_, n_, tri, sizes, method="pallas_multi"))
        return f

    gv_a, gn_a = jax.grad(loss(rasterize_pyramid), argnums=(0, 1))(v, n)
    gv_b, gn_b = jax.grad(loss(rasterize_pyramid_fused), argnums=(0, 1))(v, n)
    # same winner maps -> same interp recompute -> gradients agree to fp
    # noise of the (value**2) cotangents, which differ at ~1e-5
    np.testing.assert_allclose(np.asarray(gv_a), np.asarray(gv_b),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gn_a), np.asarray(gn_b),
                               rtol=1e-3, atol=1e-4)


def test_multi_level_tile32():
    """The big-image tile-32 machinery (auto-selected at top > 256, where
    interpret mode would be too slow to test) exercised at top=64 via the
    tile override: 6 in-kernel level blocks (32..1 px/tile), a 2x2 grid,
    and the span tiers at tile-32 granularity — every level bit-equal to
    the dense oracle, winner AND fused-value mode."""
    rng = np.random.RandomState(7)
    nv, nf, B, top = 60, 200, 2, 64
    v = jnp.asarray(rng.randn(B, nv, 3).astype(np.float32) * 0.7)
    tri = jnp.asarray(rng.randint(0, nv, (nf, 3)).astype(np.int32))
    outs = rp.rasterize_winners_pallas_multi(v, tri, top, 5, tile=32)
    for k, win in enumerate(outs):
        s = top >> k
        dense = np.asarray(rasterize_winners(v, tri, s, s))
        np.testing.assert_array_equal(dense, np.asarray(win),
                                      err_msg=f"tile32 level {k}")
    attrs = jnp.asarray(rng.randn(B, nv, 3).astype(np.float32))
    fused = rp.rasterize_winners_pallas_multi(v, tri, top, 5, attrs=attrs,
                                              tile=32)
    ref = rp.rasterize_winners_pallas_multi(v, tri, top, 5, attrs=attrs)
    for k, ((va, wa), (vb, wb)) in enumerate(zip(fused, ref)):
        np.testing.assert_array_equal(np.asarray(wa), np.asarray(wb),
                                      err_msg=f"tile32 fused win {k}")
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb),
                                      err_msg=f"tile32 fused val {k}")
