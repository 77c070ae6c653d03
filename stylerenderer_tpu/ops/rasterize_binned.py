"""Windowed/binned winner search for production meshes at high resolution.

The dense search in ``rasterize.py`` evaluates every (triangle, pixel) pair —
O(nf · H · W), unusable for ~1e5-triangle face meshes at 256²+. This module
exploits the fact that dense face-mesh triangles are tiny on screen:

1. per-triangle setup (projection, validity, integer bbox) — vectorized;
2. bbox-span *buckets*: each triangle is rasterized only inside a KxK window
   anchored at its (clamped) bbox corner, for the smallest K in ``k_list``
   that contains its span; the few triangles larger than max(k_list) go to a
   top-``big_cap``-by-span dense pass;
3. two scatter phases per bucket — phase A builds the per-pixel z-buffer via
   ``.at[p].max(z)``, phase B resolves the winning triangle as the *minimum
   triangle index achieving the buffered z* (deterministic first-wins tie
   break, identical to the dense path / the reference CPU semantics; the
   reference's CUDA z-buffer race class is eliminated by construction).

Identical candidate math (``_eval_candidate``) to the dense path, so both
searches agree bit-for-bit wherever the capacity assumptions hold; a
``jnp.where``-based overflow diagnostic (number of big triangles beyond
``big_cap``) is returned for validation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from stylerenderer_tpu.ops.rasterize import _eval_candidate, _project_verts

_NEG_INF = -jnp.inf
_BIG_ID = jnp.int32(2**31 - 1)


def _setup(vb, tri, h, w, perspective, eps):
    """Per-triangle projected verts + validity + clamped integer bbox."""
    nv = vb.shape[0]
    idx_ok = jnp.all((tri >= 0) & (tri < nv), axis=-1)
    tri_safe = jnp.clip(tri, 0, nv - 1)
    pts = vb[tri_safe]  # [nf, 3, 3]
    px, py, z, persp_ok = _project_verts(pts, h, w, perspective, eps)

    umin = jnp.min(px, -1)
    umax = jnp.max(px, -1)
    vmin = jnp.min(py, -1)
    vmax = jnp.max(py, -1)
    x0 = jnp.maximum(jnp.ceil(umin), 0.0)
    x1 = jnp.minimum(jnp.floor(umax), w - 1.0)
    y0 = jnp.maximum(jnp.ceil(vmin), 0.0)
    y1 = jnp.minimum(jnp.floor(vmax), h - 1.0)
    bbox_ok = (x1 >= x0) & (y1 >= y0)

    # backface cull (matches _eval_candidate's `front`)
    px0, px1_, px2 = px[..., 0], px[..., 1], px[..., 2]
    py0, py1_, py2 = py[..., 0], py[..., 1], py[..., 2]
    det = (
        px1_ * py2 - py1_ * px2 + py0 * px2 - px0 * py2 + px0 * py1_ - py0 * px1_
    )
    front = det <= eps

    valid = idx_ok & persp_ok & bbox_ok & front
    span = jnp.maximum(x1 - x0, y1 - y0) + 1.0
    span = jnp.where(valid, span, 0.0)
    return px, py, z, persp_ok, x0.astype(jnp.int32), y0.astype(jnp.int32), valid, span


@functools.partial(
    jax.jit,
    static_argnames=("h", "w", "perspective", "eps", "k_list", "big_cap",
                     "return_overflow"),
)
def rasterize_winners_binned(
    v, tri, h: int, w: int, perspective: bool = False, eps: float = 1e-6,
    k_list: tuple[int, ...] = (8, 32), big_cap: int = 512,
    return_overflow: bool = False,
):
    """Winner map [B, H, W] (int32, -1 background) via windowed scatter.

    With ``return_overflow=True`` also returns the per-batch count of
    triangles whose bbox span exceeds ``max(k_list)`` — results are exact
    only while that count stays <= ``big_cap`` (the computation is shared
    with the winner search, unlike the standalone ``big_overflow_count``)."""
    v = lax.stop_gradient(v).astype(jnp.float32)
    tri = jnp.asarray(tri, jnp.int32)
    B = v.shape[0]
    nf = tri.shape[0]
    hw = h * w
    tri_ids = jnp.arange(nf, dtype=jnp.int32)
    k_list = tuple(min(k, max(h, w)) for k in k_list)
    kmax = max(k_list)

    def per_batch(vb):
        px, py, z, persp_ok, ax0, ay0, valid, span = _setup(
            vb, tri, h, w, perspective, eps
        )

        def window_candidates(K, lo, mask_extra):
            """Candidates of the K-window bucket: returns (p [nf, K*K],
            depth [nf, K*K], cov)."""
            active = valid & (span <= K) & (span > lo) & mask_extra
            ax = jnp.clip(ax0, 0, max(w - K, 0))
            ay = jnp.clip(ay0, 0, max(h - K, 0))
            d = jnp.arange(K, dtype=jnp.int32)
            X = (ax[:, None] + d[None, :]).astype(jnp.float32)  # [nf, K]
            Y = (ay[:, None] + d[None, :]).astype(jnp.float32)
            Xg = X[:, None, :]  # [nf, 1, K]
            Yg = Y[:, :, None]  # [nf, K, 1]
            _, depth, cov = _eval_candidate(
                px[:, None, None, :], py[:, None, None, :], z[:, None, None, :],
                persp_ok[:, None, None], Xg, Yg, h, w, perspective, eps,
            )  # [nf, K, K]
            cov = cov & active[:, None, None]
            p = jnp.where(
                cov,
                (Yg.astype(jnp.int32) * w + Xg.astype(jnp.int32)),
                hw,
            )
            return (
                p.reshape(nf, K * K),
                depth.reshape(nf, K * K),
                cov.reshape(nf, K * K),
            )

        # big-triangle dense pass: top big_cap by span among span > kmax
        n_big_total = jnp.sum((span > kmax).astype(jnp.int32))
        big_span, big_idx = lax.top_k(jnp.where(span > kmax, span, -1.0),
                                      min(big_cap, nf))
        big_active = big_span > 0

        ys, xs = jnp.divmod(jnp.arange(hw, dtype=jnp.int32), w)
        Xf = xs.astype(jnp.float32)[None, :]
        Yf = ys.astype(jnp.float32)[None, :]
        _, big_depth, big_cov = _eval_candidate(
            px[big_idx][:, None, :], py[big_idx][:, None, :],
            z[big_idx][:, None, :], persp_ok[big_idx][:, None],
            Xf, Yf, h, w, perspective, eps,
        )  # [C, HW]
        big_cov = big_cov & big_active[:, None]
        big_zm = jnp.where(big_cov, big_depth, _NEG_INF)
        big_zmax = jnp.max(big_zm, axis=0)  # [HW]

        # phase A: z-buffer
        zbuf = jnp.full(hw + 1, _NEG_INF, jnp.float32)
        zbuf = zbuf.at[:hw].max(big_zmax)
        lo = 0
        passes = []
        for K in k_list:
            p, depth, cov = window_candidates(K, lo, jnp.ones_like(valid))
            passes.append((p, depth, cov))
            zbuf = zbuf.at[p.reshape(-1)].max(
                jnp.where(cov, depth, _NEG_INF).reshape(-1)
            )
            lo = K

        # phase B: minimum triangle id achieving the buffered z
        win = jnp.full(hw + 1, _BIG_ID, jnp.int32)
        big_hit = big_cov & (big_depth == zbuf[None, :hw])
        win_big = jnp.min(
            jnp.where(big_hit, tri_ids[big_idx][:, None], _BIG_ID), axis=0
        )
        win = win.at[:hw].min(win_big)
        for p, depth, cov in passes:
            hit = cov & (depth == zbuf[p])
            cand = jnp.where(hit, tri_ids[:, None], _BIG_ID)
            win = win.at[p.reshape(-1)].min(cand.reshape(-1))

        win = jnp.where(win == _BIG_ID, -1, win)[:hw]
        return win.reshape(h, w), n_big_total

    win, n_big = lax.map(per_batch, v)
    if return_overflow:
        return win, n_big
    return win


def big_overflow_count(v, tri, h, w, perspective=False, eps=1e-6,
                       k_list=(8, 32)):
    """Diagnostic: per-batch count of triangles larger than max(k_list)
    (must be <= big_cap for exact results)."""
    v = lax.stop_gradient(jnp.asarray(v, jnp.float32))
    kmax = min(max(k_list), max(h, w))

    def count(vb):
        *_, span = _setup(vb, jnp.asarray(tri, jnp.int32), h, w, perspective, eps)
        return jnp.sum((span > kmax).astype(jnp.int32))

    return lax.map(count, v)
