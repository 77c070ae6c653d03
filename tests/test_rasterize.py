"""Rasterizer tests: the reference's own single-triangle oracle, a serial
numpy z-buffer oracle, gradcheck of vertex/texture gradients, and
second-order differentiability (needed by R1 / path regularization)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stylerenderer_tpu.ops.rasterize import (
    rasterize,
    rasterize_index_coeff,
    rasterize_winners,
)


def _single_triangle():
    # the reference op's built-in self-test geometry (rasterize.py:83-107)
    v = np.array([[-1, -1, 0], [-1, 1, 0], [1, 0, 0]], np.float32)
    f = np.array([[2, 1, 0]], np.int32)
    t = np.array([[1, 0], [0, 1], [0, 0]], np.float32)
    return v, f, t


def _np_zbuffer_oracle(v, tri, h, w, perspective=False, eps=1e-6):
    """Serial per-triangle z-buffer rasterizer written directly from the
    math in SURVEY.md §2.1 / the rasterize.h algorithm description."""
    v = np.asarray(v, np.float64)
    if v.ndim == 2:
        v = v[None]
    B, nv, _ = v.shape
    win = -np.ones((B, h, w), np.int64)
    zbuf = np.full((B, h, w), -np.inf)
    coef = np.zeros((B, h, w, 3))
    for b in range(B):
        for t, (i0, i1, i2) in enumerate(np.asarray(tri)):
            if min(i0, i1, i2) < 0 or max(i0, i1, i2) >= nv:
                continue
            p = v[b, [i0, i1, i2]].copy()
            if perspective:
                if np.any(p[:, 2] >= -eps):
                    continue
                p[:, 0] /= -p[:, 2]
                p[:, 1] /= -p[:, 2]
            px = (1 + p[:, 0]) * w / 2 - 0.5
            py = (1 - p[:, 1]) * h / 2 - 0.5
            z = p[:, 2]
            a = np.array(
                [
                    px[1] * py[2] - py[1] * px[2],
                    py[0] * px[2] - px[0] * py[2],
                    px[0] * py[1] - py[0] * px[1],
                ]
            )
            det = a.sum()
            if det > eps:
                continue  # back-face
            bb = np.array([py[1] - py[2], py[2] - py[0], py[0] - py[1]])
            cc = np.array([px[2] - px[1], px[0] - px[2], px[1] - px[0]])
            if det < 0:
                a, bb, cc, det = -a, -bb, -cc, -det
            x0 = max(int(np.ceil(px.min())), 0)
            x1 = min(int(np.floor(px.max())), w - 1)
            y0 = max(int(np.ceil(py.min())), 0)
            y1 = min(int(np.floor(py.max())), h - 1)
            if x1 < x0 or y1 < y0:
                continue
            for yy in range(y0, y1 + 1):
                for xx in range(x0, x1 + 1):
                    raw = a + bb * xx + cc * yy
                    if np.any(raw < -eps):
                        continue
                    if det > eps:
                        c = raw / raw.sum()
                    else:
                        ll = bb * bb + cc * cc
                        i = 0 if ll[0] > ll[1] else 1
                        i = i if ll[i] > ll[2] else 2
                        j, k = (i + 1) % 3, (i + 2) % 3
                        if ll[i] > eps:
                            lj = -(xx - px[k]) * cc[i] + (yy - py[k]) * bb[i]
                            lk = (xx - px[j]) * cc[i] - (yy - py[j]) * bb[i]
                            ls = lj + lk
                            c = np.zeros(3)
                            c[j] = lj / ls
                            c[k] = lk / ls
                            if c[j] < -eps or c[k] < -eps:
                                continue
                        else:
                            if (xx - px[i]) ** 2 + (yy - py[i]) ** 2 >= eps:
                                continue
                            c = np.zeros(3)
                            c[i] = 1
                    if perspective:
                        q = c / z
                        depth = q.sum()
                        if depth >= -eps:
                            continue
                        c = q * depth
                    else:
                        depth = float(c @ z)
                    if depth > zbuf[b, yy, xx]:
                        zbuf[b, yy, xx] = depth
                        win[b, yy, xx] = t
                        coef[b, yy, xx] = c
    return win, coef


def test_reference_builtin_triangle():
    """The 5x5 render from the reference's __main__ self-test."""
    v, f, t = _single_triangle()
    out = np.asarray(rasterize(jnp.asarray(v), jnp.asarray(t), jnp.asarray(f), 5))
    assert out.shape == (5, 5, 2)
    win, coef = _np_zbuffer_oracle(v, f, 5, 5)
    want = np.zeros((5, 5, 2))
    mask = win[0] >= 0
    for yy, xx in zip(*np.nonzero(mask)):
        want[yy, xx] = coef[0, yy, xx] @ t[f[0]]
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-5)
    # the triangle spans x in [-1,1], y in [-1,1]: some interior coverage
    assert mask.sum() >= 6


@pytest.mark.parametrize("perspective", [False, True])
def test_random_mesh_matches_oracle(perspective):
    rng = np.random.RandomState(3)
    nv, nf, B, h = 12, 20, 2, 9
    v = rng.randn(B, nv, 3).astype(np.float32) * 0.6
    if perspective:
        v[:, :, 2] -= 3.0  # in front of the camera (z < 0)
    tri = rng.randint(0, nv, (nf, 3)).astype(np.int32)
    win_got = np.asarray(
        rasterize_winners(jnp.asarray(v), jnp.asarray(tri), h, h, perspective)
    )
    win_want, coef_want = _np_zbuffer_oracle(v, tri, h, h, perspective)
    np.testing.assert_array_equal(win_got, win_want)
    idx, coeff = rasterize_index_coeff(
        jnp.asarray(v), jnp.asarray(tri), h, h, perspective
    )
    np.testing.assert_allclose(np.asarray(coeff), coef_want, rtol=1e-3, atol=1e-4)


def test_gradcheck_vertices_and_texture():
    """Numeric gradcheck of d(out)/d(v) and d(out)/d(tex), mirroring the
    reference's torch.autograd.gradcheck self-test (rasterize.py:105-107).

    Perturbations are small enough not to change the winner map, so the
    interpolation-only analytic gradient must match numerics."""
    v, f, t = _single_triangle()
    v = jnp.asarray(v)[None]
    t = jnp.asarray(t)[None]
    f = jnp.asarray(f)

    def loss(v_, t_):
        out = rasterize(v_, t_, f, 5)
        # weighted sum to make the gradient non-uniform
        wgt = jnp.arange(out.size, dtype=jnp.float32).reshape(out.shape)
        return jnp.sum(out * wgt)

    gv, gt = jax.grad(loss, argnums=(0, 1))(v, t)
    eps = 1e-3
    for arg, g in ((0, gv), (1, gt)):
        x = [v, t][arg]
        rng = np.random.RandomState(0)
        for _ in range(6):
            idx = tuple(rng.randint(0, s) for s in x.shape)
            args_p = [v, t]
            args_m = [v, t]
            args_p[arg] = x.at[idx].add(eps)
            args_m[arg] = x.at[idx].add(-eps)
            num = (loss(*args_p) - loss(*args_m)) / (2 * eps)
            np.testing.assert_allclose(
                float(g[idx]), float(num), rtol=5e-2, atol=5e-3,
                err_msg=f"arg{arg} idx{idx}",
            )


def test_second_order_grad_exists():
    """R1/path-length need grad-of-grad through the rasterizer."""
    v, f, t = _single_triangle()
    v = jnp.asarray(v)[None]
    t = jnp.asarray(t)[None]
    f = jnp.asarray(f)

    def loss(v_):
        out = rasterize(v_, t, f, 5)
        return jnp.sum(out**2)

    def gnorm(v_):
        g = jax.grad(loss)(v_)
        return jnp.sum(g * g)

    gg = jax.grad(gnorm)(v)
    assert np.isfinite(np.asarray(gg)).all()


def test_background_is_zero_and_texture_grad_sparse():
    v, f, t = _single_triangle()
    out = np.asarray(rasterize(jnp.asarray(v), jnp.asarray(t), jnp.asarray(f), 5))
    win, _ = _np_zbuffer_oracle(v, f, 5, 5)
    assert np.all(out[win[0] < 0] == 0)


def test_scalar_texture():
    v, f, _ = _single_triangle()
    t = np.array([1.0, 2.0, 3.0], np.float32)
    out = rasterize(jnp.asarray(v), jnp.asarray(t), jnp.asarray(f), 5)
    assert out.shape == (5, 5)


def test_batched():
    rng = np.random.RandomState(1)
    v = rng.randn(3, 6, 3).astype(np.float32) * 0.5
    tri = rng.randint(0, 6, (4, 3)).astype(np.int32)
    tex = rng.randn(3, 6, 2).astype(np.float32)
    out = rasterize(jnp.asarray(v), jnp.asarray(tex), jnp.asarray(tri), 8)
    assert out.shape == (3, 8, 8, 2)
    win_want, coef_want = _np_zbuffer_oracle(v, tri, 8, 8)
    want = np.zeros((3, 8, 8, 2))
    for b in range(3):
        for yy, xx in zip(*np.nonzero(win_want[b] >= 0)):
            tt = tri[win_want[b, yy, xx]]
            want[b, yy, xx] = coef_want[b, yy, xx] @ tex[b, tt]
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-3, atol=1e-4)


def test_out_of_range_indices_skipped_and_finite():
    """Triangles with negative / out-of-range vertex ids are skipped by every
    winner backend AND never poison the interpolated output (jnp.take's
    default fill mode yields NaN rows; 0 * NaN would NaN even background
    pixels — regression test for the clipped _triangle_table gather)."""
    rng = np.random.RandomState(0)
    v = jnp.asarray(rng.randn(1, 50, 3).astype(np.float32))
    tex = jnp.asarray(rng.randn(1, 50, 3).astype(np.float32))
    bad = jnp.asarray(np.array([[0, 1, 999999], [-5, 2, 3]], np.int32))
    out = np.asarray(rasterize(v, tex, bad, 16))
    assert np.isfinite(out).all()
    assert (out == 0).all()  # both triangles skipped -> all background
    g = jax.grad(lambda vv: jnp.sum(rasterize(vv, tex, bad, 16) ** 2))(v)
    assert np.isfinite(np.asarray(g)).all()
