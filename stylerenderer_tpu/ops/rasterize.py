"""Differentiable z-buffered triangle rasterization of per-vertex attributes.

The heart of the GAR: renders a 3DMM face mesh's per-vertex normals into the
normal-map pyramid that conditions the generator.

Semantics follow the reference native op (``/root/reference/op/rasterize.{h,cpp,cu,py}``):

- vertices are NDC; pixel transform ``px = (1+x)*S/2 - 0.5``,
  ``py = (1-y)*S/2 - 0.5`` (the reference scales both axes by the *height*
  — its ``barycentric`` is invoked with swapped extents, which is only
  correct for square images; we implement the intended x↔width / y↔height
  mapping, identical on the square images the model uses).
- optional perspective: pre-divide x,y by ``-z`` (cull any vertex with
  ``z >= -eps``); barycentric coefficients are perspective-corrected.
- back-face cull: signed area ``det > eps`` is culled; negative-area
  triangles are flipped to positive.
- inside test on the *unnormalized* coefficients (``>= -eps``), plus the
  integer bbox test (``ceil(min) <= p <= floor(max)``, clamped to the image).
- degenerate triangles (``|det| <= eps``) fall back to projection onto the
  longest edge (segment) or to a point test, as in ``rasterize.h:77-124``.
- z-test keeps the max-z (closest, camera looks down -z) triangle; ties keep
  the first triangle in index order (the reference CPU path's strict
  compare; its CUDA path is racy by design — ours is deterministic).
- gradients are interpolation-only: the winning-triangle index map is a
  piecewise-constant function treated as constant (like the reference's
  backward, ``rasterize.py:39-80`` + ``rasterize.h:168-228``, and like
  nvdiffrast's rasterize stage — no edge/coverage gradient).

TPU-native design: rather than a hand-written VJP, the winner search runs
under ``stop_gradient`` and the barycentric coefficients of the winning
triangle are *recomputed* as a differentiable closed-form expression of the
vertices. JAX autodiff then yields exact first- AND second-order gradients
(needed for R1 / path-length regularization) for free, and the whole op jits
into dense, statically-shaped XLA ops.

Two execution strategies for the winner search:

- ``dense``:   scan over triangle chunks, evaluating every (triangle, pixel)
  pair with an in-register z-max. Exact, simple; cost O(nf * H * W) — the
  right choice for small images or small meshes (and the test oracle).
- ``binned``:  sort-based triangle binning into image tiles + per-tile
  z-resolve (see ``rasterize_binned.py``) for production meshes (~1e5
  triangles) at high resolution.

``method='auto'`` picks by problem size.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

_NEG_INF = -jnp.inf


def _project_verts(pts, h: int, w: int, perspective: bool, eps: float):
    """NDC -> pixel coords. pts [..., 3, 3] -> (px, py, z, persp_ok) each [..., 3]."""
    x = pts[..., 0]
    y = pts[..., 1]
    z = pts[..., 2]
    if perspective:
        ok = z < -eps
        zsafe = jnp.where(ok, z, -1.0)
        x = x / -zsafe
        y = y / -zsafe
        persp_ok = jnp.all(ok, axis=-1)
    else:
        persp_ok = jnp.ones(pts.shape[:-2], bool)
    px = (1.0 + x) * (w / 2.0) - 0.5
    py = (1.0 - y) * (h / 2.0) - 0.5
    return px, py, z, persp_ok


def _eval_candidate(px, py, z, persp_ok, X, Y, h: int, w: int,
                    perspective: bool, eps: float):
    """Evaluate one triangle at pixel coords (X, Y).

    px/py/z: [..., 3] projected vertices; X/Y broadcastable to the result.
    Returns (coeff [..., 3], depth [...], covered [...]).

    All branches are evaluated with safe denominators so the expression is
    differentiable everywhere (branch *conditions* depend only on values that
    callers pass through stop_gradient when needed).
    """
    px0, px1, px2 = px[..., 0], px[..., 1], px[..., 2]
    py0, py1, py2 = py[..., 0], py[..., 1], py[..., 2]

    # adjugate rows (reference rasterize.h:51-62)
    a0 = px1 * py2 - py1 * px2
    a1 = py0 * px2 - px0 * py2
    a2 = px0 * py1 - py0 * px1
    det = a0 + a1 + a2
    front = det <= eps  # det > eps is back-facing -> culled
    sign = jnp.where(det < 0, -1.0, 1.0)
    det_pos = det * sign

    b0 = (py1 - py2) * sign
    b1 = (py2 - py0) * sign
    b2 = (py0 - py1) * sign
    c0 = (px2 - px1) * sign
    c1 = (px0 - px2) * sign
    c2 = (px1 - px0) * sign
    a0, a1, a2 = a0 * sign, a1 * sign, a2 * sign

    # integer bbox (reference rasterize.h:39-49), clamped to the image
    umin = jnp.minimum(jnp.minimum(px0, px1), px2)
    umax = jnp.maximum(jnp.maximum(px0, px1), px2)
    vmin = jnp.minimum(jnp.minimum(py0, py1), py2)
    vmax = jnp.maximum(jnp.maximum(py0, py1), py2)
    x0 = jnp.maximum(jnp.ceil(umin), 0.0)
    x1 = jnp.minimum(jnp.floor(umax), w - 1.0)
    y0 = jnp.maximum(jnp.ceil(vmin), 0.0)
    y1 = jnp.minimum(jnp.floor(vmax), h - 1.0)
    bbox_ok = (x1 >= x0) & (y1 >= y0)
    in_bbox = (X >= x0) & (X <= x1) & (Y >= y0) & (Y <= y1)

    # raw (area-scaled) coefficients at the pixel
    r0 = a0 + b0 * X + c0 * Y
    r1 = a1 + b1 * X + c1 * Y
    r2 = a2 + b2 * X + c2 * Y
    raw_ok = (r0 >= -eps) & (r1 >= -eps) & (r2 >= -eps)

    nondeg = det_pos > eps

    # --- non-degenerate: normalize by the coefficient sum (rasterize.h:81-86)
    s = r0 + r1 + r2
    s_safe = jnp.where(jnp.abs(s) > 1e-30, s, 1.0)
    # ONE reciprocal + 3 multiplies instead of 3 divides — the same change
    # is applied in every backend (pallas _kernel_eval/_eval_one_level) so
    # winner maps and values stay bit-identical across them; divides are
    # the most expensive VPU op in the z-scan's per-pixel candidate math
    s_inv = 1.0 / s_safe
    cn0, cn1, cn2 = r0 * s_inv, r1 * s_inv, r2 * s_inv
    # Coefficient clamp: true barycentrics of a covered pixel lie in
    # [-eps', 1+eps'], so the clamp is a no-op on every well-conditioned
    # pixel — but for high-aspect sliver triangles at production coordinate
    # scale, r and s are catastrophic cancellations (each term ~1e5 summing
    # to ~det ~ 1e-6, f32 noise ~1e-2), and the unguarded ratio reaches
    # ~1e18 with unbounded gradients — the round-2 production inversion NaN
    # (geometry params die by iter ~16). The clamp bounds both the
    # interpolated value and, through clip's zero-outside-gradient, the
    # vertex gradient. The reference (rasterize.h:81-86) divides unguarded
    # and has the same failure mode on CUDA; bounding it is part of this
    # port's robustness contract, applied identically in every backend so
    # winner maps stay bit-identical across them.
    cn0 = jnp.clip(cn0, -1.0, 2.0)
    cn1 = jnp.clip(cn1, -1.0, 2.0)
    cn2 = jnp.clip(cn2, -1.0, 2.0)

    # --- degenerate fallback (rasterize.h:87-120)
    l0 = b0 * b0 + c0 * c0
    l1 = b1 * b1 + c1 * c1
    l2 = b2 * b2 + c2 * c2
    i_idx = jnp.where(l0 > l1, 0, 1)
    li_val = jnp.where(i_idx == 0, l0, l1)
    i_idx = jnp.where(li_val > l2, i_idx, 2)

    def sel3(t0, t1, t2, idx):
        return jnp.where(idx == 0, t0, jnp.where(idx == 1, t1, t2))

    j_idx = (i_idx + 1) % 3
    k_idx = (j_idx + 1) % 3
    b_i = sel3(b0, b1, b2, i_idx)
    c_i = sel3(c0, c1, c2, i_idx)
    l_i = sel3(l0, l1, l2, i_idx)
    px_i = sel3(px0, px1, px2, i_idx)
    py_i = sel3(py0, py1, py2, i_idx)
    px_j = sel3(px0, px1, px2, j_idx)
    py_j = sel3(py0, py1, py2, j_idx)
    px_k = sel3(px0, px1, px2, k_idx)
    py_k = sel3(py0, py1, py2, k_idx)

    seg = l_i > eps
    lj = -(X - px_k) * c_i + (Y - py_k) * b_i
    lk = (X - px_j) * c_i - (Y - py_j) * b_i
    lsum = lj + lk
    lsum_safe = jnp.where(jnp.abs(lsum) > 1e-30, lsum, 1.0)
    cj = jnp.clip(lj / lsum_safe, -1.0, 2.0)
    ck = jnp.clip(lk / lsum_safe, -1.0, 2.0)
    seg_ok = (cj >= -eps) & (ck >= -eps)

    # point fallback
    dpt = (X - px_i) ** 2 + (Y - py_i) ** 2
    pt_ok = dpt < eps

    def deg_coeff(target):
        # coefficient of vertex `target` in the degenerate branches
        seg_c = jnp.where(target == i_idx, 0.0, jnp.where(target == j_idx, cj, ck))
        pt_c = jnp.where(target == i_idx, 1.0, 0.0)
        return jnp.where(seg, seg_c, pt_c)

    d0, d1, d2 = deg_coeff(0), deg_coeff(1), deg_coeff(2)
    deg_ok = jnp.where(seg, seg_ok, pt_ok)

    co0 = jnp.where(nondeg, cn0, d0)
    co1 = jnp.where(nondeg, cn1, d1)
    co2 = jnp.where(nondeg, cn2, d2)
    cov = front & persp_ok & bbox_ok & in_bbox & raw_ok & jnp.where(nondeg, True, deg_ok)

    z0, z1, z2 = z[..., 0], z[..., 1], z[..., 2]
    if perspective:
        # perspective-correct interpolation (rasterize.h:132-140)
        z0s = jnp.where(z0 < -eps, z0, -1.0)
        z1s = jnp.where(z1 < -eps, z1, -1.0)
        z2s = jnp.where(z2 < -eps, z2, -1.0)
        # reciprocal on the per-triangle z, multiply per-pixel (lockstep
        # with the pallas _kernel_depth — see s_inv note above)
        q0 = co0 * (1.0 / z0s)
        q1 = co1 * (1.0 / z1s)
        q2 = co2 * (1.0 / z2s)
        depth = q0 + q1 + q2
        cov = cov & (depth < -eps)
        co0 = q0 * depth
        co1 = q1 * depth
        co2 = q2 * depth
    else:
        depth = co0 * z0 + co1 * z1 + co2 * z2

    coeff = jnp.stack([co0, co1, co2], axis=-1)
    return coeff, depth, cov


def _auto_chunk(nf: int, hw: int) -> int:
    # keep the [B, T, HW] intermediate around ~2^22 elements
    t = max(1, (1 << 22) // max(hw, 1))
    t = min(t, nf)
    return int(t)


@functools.partial(
    jax.jit, static_argnames=("h", "w", "perspective", "eps", "chunk")
)
def rasterize_winners(v, tri, h: int, w: int, perspective: bool = False,
                      eps: float = 1e-6, chunk: int | None = None):
    """Dense winner search: per-pixel winning triangle index.

    Args:
      v: ``[B, nv, 3]`` NDC vertices.
      tri: ``[nf, 3]`` int vertex indices (negative/out-of-range = skipped).
    Returns:
      (win ``[B, H, W]`` int32 triangle index, -1 for background).
    """
    v = lax.stop_gradient(v).astype(jnp.float32)
    B, nv, _ = v.shape
    nf = tri.shape[0]
    hw = h * w

    if chunk is None:
        chunk = _auto_chunk(nf, hw)
    pad = (-nf) % chunk
    tri_p = jnp.concatenate(
        [tri.astype(jnp.int32), jnp.full((pad, 3), -1, jnp.int32)], 0
    )
    n_chunks = tri_p.shape[0] // chunk
    tri_chunks = tri_p.reshape(n_chunks, chunk, 3)
    tid_chunks = jnp.arange(n_chunks * chunk, dtype=jnp.int32).reshape(n_chunks, chunk)

    ys, xs = jnp.divmod(jnp.arange(hw, dtype=jnp.int32), w)
    X = xs.astype(jnp.float32)[None, None, :]  # [1, 1, HW]
    Y = ys.astype(jnp.float32)[None, None, :]

    def step(carry, chunk_data):
        zbest, tbest = carry  # [B, HW]
        tc, tids = chunk_data  # [T, 3], [T]
        idx_ok = jnp.all((tc >= 0) & (tc < nv), axis=-1)  # [T]
        tc_safe = jnp.clip(tc, 0, nv - 1)
        pts = v[:, tc_safe.reshape(-1), :].reshape(B, chunk, 3, 3)
        px, py, z, persp_ok = _project_verts(pts, h, w, perspective, eps)
        # insert a pixel axis: [B, T, 1, 3] vs X/Y [1, 1, HW] -> [B, T, HW]
        _, depth, cov = _eval_candidate(
            px[:, :, None, :], py[:, :, None, :], z[:, :, None, :],
            persp_ok[:, :, None], X, Y, h, w, perspective, eps,
        )
        cov = cov & idx_ok[None, :, None]
        zm = jnp.where(cov, depth, _NEG_INF)  # [B, T, HW]
        z_c = jnp.max(zm, axis=1)  # [B, HW]
        i_c = jnp.argmax(zm, axis=1)  # first max -> lowest triangle idx
        t_c = tids[i_c]
        upd = z_c > zbest
        zbest = jnp.where(upd, z_c, zbest)
        tbest = jnp.where(upd, t_c, tbest)
        return (zbest, tbest), None

    zinit = jnp.full((B, hw), _NEG_INF, jnp.float32)
    tinit = jnp.full((B, hw), -1, jnp.int32)
    (zb, tb), _ = lax.scan(step, (zinit, tinit), (tri_chunks, tid_chunks))
    return tb.reshape(B, h, w)


def _triangle_table(v, tex_b, tri):
    """Per-triangle corner table ``[B, nf, 3, 3+C]`` (corner NDC xyz +
    corner attributes). Built ONCE per rasterization (nf rows), it turns
    every per-pixel winner lookup into a single contiguous-row gather —
    measured ~2x faster than three scattered per-vertex fetches per pixel,
    and shared across all pyramid levels. Differentiable in v/tex (the
    backward is a segment-sum over nf rows)."""
    if tex_b is None:
        src = v
    else:
        dt = jnp.promote_types(v.dtype, tex_b.dtype)
        src = jnp.concatenate([v.astype(dt), tex_b.astype(dt)], axis=-1)
    nf = tri.shape[0]
    # clip, don't fill: out-of-range vertex ids mark skipped triangles —
    # every winner backend masks them out of the search (rasterize.py:245,
    # rasterize_binned.py:41, rasterize_pallas.py:588), so their rows are
    # only ever read behind a zero coefficient; jnp.take's default fill
    # mode would turn them into NaN and 0*NaN poisons background pixels
    vids = jnp.clip(tri.astype(jnp.int32).reshape(-1), 0, src.shape[1] - 1)
    tbl = jnp.take(src, vids, axis=1)
    return tbl.reshape(src.shape[0], nf, 3, src.shape[-1])


def _winner_gather(v, tex_b, tri, win, h: int, w: int, tbl=None):
    """Per-pixel gather of the winning triangle's vertices (and optionally
    per-vertex attributes): ONE contiguous per-triangle row per pixel from
    the ``_triangle_table`` (pass ``tbl`` to share it across pyramid
    levels).

    Returns (vidx [B,H,W,3] i32, pts [B,H,W,3,3] v.dtype,
    gtex [B,H,W,3,C] or None).
    """
    B = v.shape[0]
    nf = tri.shape[0]
    win_safe = jnp.clip(win, 0, nf - 1)
    vidx = tri.astype(jnp.int32)[win_safe]  # [B, H, W, 3]
    if tbl is None:
        tbl = _triangle_table(v, tex_b, tri)
    R = tbl.shape[-1]
    rows = jnp.take_along_axis(
        tbl.reshape(B, nf, 3 * R),
        win_safe.reshape(B, h * w, 1),
        axis=1,
    ).reshape(B, h, w, 3, R)
    pts = rows[..., :3].astype(v.dtype)
    gtex = rows[..., 3:] if tex_b is not None else None
    return vidx, pts, gtex


def _coeff_from_pts(pts, h: int, w: int, perspective: bool, eps: float):
    """Differentiable barycentric coefficients at every pixel center for the
    given per-pixel triangle vertices ``pts [B, H, W, 3, 3]``."""
    ys, xs = jnp.divmod(jnp.arange(h * w, dtype=jnp.int32), w)
    X = xs.astype(jnp.float32).reshape(1, h, w)
    Y = ys.astype(jnp.float32).reshape(1, h, w)
    px, py, z, persp_ok = _project_verts(pts, h, w, perspective, eps)
    coeff, _, _ = _eval_candidate(px, py, z, persp_ok, X, Y, h, w,
                                  perspective, eps)
    return coeff


def winner_coeff(v, tri, win, h: int, w: int, perspective: bool = False,
                 eps: float = 1e-6):
    """Differentiable barycentric coefficients of the winning triangles.

    Args:
      v: ``[B, nv, 3]`` NDC vertices (gradients flow).
      win: ``[B, H, W]`` winning triangle index (-1 = background).
    Returns:
      (coeff ``[B, H, W, 3]`` — zero on background, vidx ``[B, H, W, 3]`` int32
      winning vertex indices — zero on background).
    """
    valid = win >= 0
    vidx, pts, _ = _winner_gather(v, None, tri, win, h, w)
    coeff = _coeff_from_pts(pts, h, w, perspective, eps)
    coeff = jnp.where(valid[..., None], coeff, 0.0)
    vidx = jnp.where(valid[..., None], vidx, 0)
    return coeff, vidx


def rasterize_index_coeff(v, tri, h: int = 256, w: int = 0,
                          perspective: bool = False, eps: float = 1e-6,
                          method: str = "auto"):
    """Mirror of the reference native op's output: per-pixel vertex-index
    triplet and interpolation coefficients (``rasterize.cpp:97-177``).

    Background pixels get index 0 / coeff 0 (as the reference's zero-init
    buffers do).
    """
    v = jnp.asarray(v)
    if v.ndim == 2:
        v = v[None]
    w = w if w > 0 else h
    win = _dispatch_winners(v, tri, h, w, perspective, eps, method)
    coeff, vidx = winner_coeff(v, tri, win, h, w, perspective, eps)
    return vidx, coeff


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform not in ("cpu", "gpu")
    except Exception:
        return False


def _dispatch_winners(v, tri, h, w, perspective, eps, method):
    if method == "auto":
        nf = tri.shape[0]
        if nf * h * w <= (1 << 24) or h % 8 or w % 8:
            # dense work is O(nf*h*w): fine for small problems, and the only
            # option for sub-tile images (the 4x4 pyramid base)
            method = "dense"
        elif _on_tpu():
            method = "pallas"
        else:
            method = "binned"
    if method == "dense":
        return rasterize_winners(v, tri, h, w, perspective, eps)
    if method == "binned":
        from stylerenderer_tpu.ops.rasterize_binned import rasterize_winners_binned

        return rasterize_winners_binned(v, tri, h, w, perspective, eps)
    if method == "pallas":
        from stylerenderer_tpu.ops.rasterize_pallas import rasterize_winners_pallas

        return rasterize_winners_pallas(v, tri, h, w, perspective, eps)
    raise ValueError(f"unknown rasterize method {method!r}")


def rasterize(v, tex, tri, h: int = 256, w: int = 0, perspective: bool = False,
              eps: float = 1e-6, method: str = "auto"):
    """Rasterize per-vertex attributes ``tex`` over the mesh ``(v, tri)``.

    Args:
      v: ``[B, nv, 3]`` (or ``[nv, 3]``) NDC vertices.
      tex: ``[B, nv, C]`` / ``[nv, C]`` per-vertex attributes, or ``[B, nv]``
        / ``[nv]`` for scalar attributes.
      tri: ``[nf, 3]`` int triangle vertex indices.
      h, w: output size (``w=0`` -> square).
    Returns:
      ``[B, H, W, C]`` (or ``[B, H, W]`` for scalar ``tex``); differentiable
      in ``v`` (interpolation-only) and ``tex`` (exact), any order.

    Reference: ``rasterize.py:17-82``.
    """
    v = jnp.asarray(v)
    tex = jnp.asarray(tex)
    # scalar attributes have one axis fewer than v (reference rasterize.py:25)
    scalar_tex = tex.ndim == v.ndim - 1
    squeeze_batch = v.ndim == 2
    if squeeze_batch:
        v = v[None]
        tex = tex[None]
    B = v.shape[0]
    tex_b = tex[..., None] if scalar_tex else tex  # [B, nv, C]

    w = w if w > 0 else h
    win = _dispatch_winners(v, tri, h, w, perspective, eps, method)
    out = _interp_from_win(v, tex_b, tri, win, h, w, perspective, eps)
    if scalar_tex:
        out = out[..., 0]
    if squeeze_batch:
        out = out[0]
    return out


def _interp_from_win(v, tex_b, tri, win, h, w, perspective, eps, tbl=None):
    """Differentiable interpolation given a winner map: ONE per-pixel
    row gather of the winning triangle's corners + attributes, coefficient
    recompute (the gradient path), weighted sum."""
    valid = win >= 0
    _, pts, gathered = _winner_gather(v, tex_b, tri, win, h, w, tbl=tbl)
    coeff = _coeff_from_pts(pts, h, w, perspective, eps)
    coeff = jnp.where(valid[..., None], coeff, 0.0)
    cf = coeff[..., None].astype(gathered.dtype)
    # explicit (c0*a0 + c1*a1) + c2*a2 order — the Pallas multi kernel's
    # in-loop interpolation uses the same association, keeping fused values
    # bit-identical to this oracle (a jnp.sum over the corner axis leaves
    # the reduction order to XLA)
    out = (cf[..., 0, :] * gathered[..., 0, :]
           + cf[..., 1, :] * gathered[..., 1, :]
           + cf[..., 2, :] * gathered[..., 2, :])
    return out.astype(tex_b.dtype)


def _make_fused_levels(tri, top: int, covered, perspective: bool, eps: float):
    """Build the custom-VJP fused pyramid op for the ``covered`` level list.

    Forward: ONE multi-level Pallas pass interpolates the winning triangle's
    attributes in-register (no per-pixel gathers) and also emits the winner
    maps. Backward: the standard differentiable coefficient-recompute
    (``_interp_from_win``) VJP per level, seeded with the saved winner maps
    — so gradients are exactly ``rasterize_pyramid``'s interpolation-only
    gradients, while forward-only callers never pay the gather cost.
    (First-order only, like any custom_vjp; the training step never
    differentiates through the pyramid — path-length reg treats the norm
    maps as leaves, reference train.py:340-345.)
    """
    from stylerenderer_tpu.ops.rasterize_pallas import (
        rasterize_winners_pallas_multi,
    )
    n_levels = len(covered)

    def run_kernel(v, tex_b):
        return rasterize_winners_pallas_multi(
            v, tri, top, n_levels, perspective, eps,
            attrs=tex_b.astype(jnp.float32),
        )

    @jax.custom_vjp
    def fused(v, tex_b):
        return [va.astype(tex_b.dtype) for va, _ in run_kernel(v, tex_b)]

    def fwd(v, tex_b):
        outs = run_kernel(v, tex_b)
        return (
            [va.astype(tex_b.dtype) for va, _ in outs],
            (v, tex_b, [w for _, w in outs]),
        )

    def bwd(res, cts):
        v, tex_b, wins = res

        def all_levels(vv, tt):
            # ONE shared triangle table: level cotangents sum into its rows
            # and a single segment-sum carries them back to vertices
            tbl = _triangle_table(vv, tt, tri)
            return [
                _interp_from_win(vv, tt, tri, win, s, s, perspective, eps,
                                 tbl=tbl)
                for win, s in zip(wins, covered)
            ]

        _, vjp_fn = jax.vjp(all_levels, v, tex_b)
        gv, gt = vjp_fn(list(cts))
        return gv, gt

    fused.defvjp(fwd, bwd)
    return fused


def rasterize_pyramid_fused(v, tex, tri, sizes, perspective: bool = False,
                            eps: float = 1e-6, method: str = "auto"):
    """``rasterize_pyramid`` with fused in-kernel attribute interpolation:
    on TPU the Pallas pass emits the finished value maps directly, skipping
    the per-pixel gather + coefficient recompute that dominates the forward
    cost at production mesh sizes. Winner selection AND interpolated values
    are bit-identical to the dense oracle: the in-kernel interpolation uses
    the same clamped coefficients and the same association order as
    ``_interp_from_win``, and the winner's value is extracted with an exact
    one-hot lane sum (``bench.py --check`` audits both equalities on chip
    and records ``fused_{winner,values}_bitexact`` in the bench JSON; the
    committed CPU contract is tests/test_rasterize_pallas.py).

    Differentiable: a custom VJP recomputes the interpolation-only gradients
    from the winner maps on the backward pass, identical to
    ``rasterize_pyramid``'s gradients (first order; the train step never
    needs second-order through the pyramid).
    """
    v = jnp.asarray(v)
    tex = jnp.asarray(tex)
    if v.ndim == 2:
        v, tex = v[None], tex[None]
    scalar_tex = tex.ndim == v.ndim - 1
    tex_b = tex[..., None] if scalar_tex else tex
    sizes = list(sizes)

    maps = {}
    use_multi = (
        tex_b.shape[-1] <= 7
        and (method in ("auto", "pallas_multi"))
        and (_on_tpu() or method == "pallas_multi")
    )
    if use_multi:
        top = max(sizes)
        tile = 16 if top <= 256 else 32
        if top % tile == 0:
            # levels below 1 px/tile (the 8/4 px pyramid tail) are covered
            # too: the kernel runs them in a single-tile second pass over
            # the same binned data
            covered = []
            k = 0
            while (top >> k) >= 1 and (top >> k) in sizes:
                covered.append(top >> k)
                k += 1
            if len(covered) > 1 or (len(covered) == 1 and covered[0] == top):
                fused = _make_fused_levels(tri, top, covered, perspective, eps)
                maps = dict(zip(covered, fused(v, tex_b)))
    meth = "auto" if method == "pallas_multi" else method
    results = []
    for s in sizes:
        m = maps.get(s)
        if m is None:
            win = _dispatch_winners(v, tri, s, s, perspective, eps, meth)
            m = _interp_from_win(v, tex_b, tri, win, s, s, perspective, eps)
        m = m.astype(tex_b.dtype)
        results.append(m[..., 0] if scalar_tex else m)
    return results


def rasterize_pyramid(v, tex, tri, sizes, perspective: bool = False,
                      eps: float = 1e-6, method: str = "auto"):
    """Rasterize ``tex`` at every resolution in ``sizes`` (the GAR's
    normal-map pyramid, reference model.py:260-270) — ``[B, s, s, C]`` per
    size, bit-identical to per-size ``rasterize`` calls.

    On TPU the power-of-two tail of ``sizes`` is produced by ONE multi-level
    Pallas pass (one triangle sort + one streaming z-buffer pass for the
    whole pyramid instead of one per level); the remaining small sizes use
    the dense search. Gradients flow through the per-level coefficient
    recompute exactly as in ``rasterize``.
    """
    v = jnp.asarray(v)
    tex = jnp.asarray(tex)
    if v.ndim == 2:
        v, tex = v[None], tex[None]
    tex_b = tex[..., None] if tex.ndim == v.ndim - 1 else tex
    sizes = list(sizes)

    wins = {}
    use_multi = method in ("auto", "pallas_multi") and _on_tpu()
    if method == "pallas_multi" and not _on_tpu():
        use_multi = True  # explicit request (tests run interpret mode on CPU)
    if use_multi:
        top = max(sizes)
        tile = 16 if top <= 256 else 32
        if top % tile == 0:
            # all pyramid levels, incl. the sub-tile 8/4 px tail (second
            # single-tile pass inside the multi kernel)
            covered = []
            k = 0
            while (top >> k) >= 1 and (top >> k) in sizes:
                covered.append(top >> k)
                k += 1
            if len(covered) > 1:
                from stylerenderer_tpu.ops.rasterize_pallas import (
                    rasterize_winners_pallas_multi,
                )

                outs = rasterize_winners_pallas_multi(
                    v, tri, top, len(covered), perspective, eps
                )
                wins = dict(zip(covered, outs))
    meth = "auto" if method == "pallas_multi" else method
    tbl = _triangle_table(v, tex_b, tri)  # shared across levels
    results = []
    for s in sizes:
        win = wins.get(s)
        if win is None:
            win = _dispatch_winners(v, tri, s, s, perspective, eps, meth)
        results.append(
            _interp_from_win(v, tex_b, tri, win, s, s, perspective, eps,
                             tbl=tbl)
        )
    return results
