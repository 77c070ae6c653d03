"""Pallas TPU rasterizer: per-tile VMEM z-buffer over home-tile-sorted
triangles.

The production winner search. Design:

JAX-side binning (one nf-length sort, no per-entry expansion):
  1. per-triangle setup: projected verts, validity, integer bbox in 8x8
     tile coordinates;
  2. every triangle gets ONE key: ``tier * ntiles + home`` where home is its
     bbox' top-left tile and the tier encodes its tile span (TIER_SPANS:
     single-tile, <= 2x2, <= 4x4, <= 16x16, XL = anything bigger);
  3. one ``lax.sort`` of (key, tri_id) + ``searchsorted`` segment starts;
  4. per-triangle data gathered once in sorted order as ``[16, nf]`` f32
     (triangles on lanes): rows 0-2 px, 3-5 py, 6-8 z, 9 id.

Pallas kernel (grid = (B, n_tiles)): a tile is touched only by triangles
whose home lies in a tier-sized neighborhood up/left of it, and homes along
one tile row are CONTIGUOUS in sort order — so each tile's worklist is a
handful of contiguous segments of the sorted array (one per home row per
tier: 1 + 2 + 4 + 16 ranges + 1 global XL range).
Each range is streamed HBM->VMEM in 128-triangle chunks (DMA offsets forced
128-aligned, tails masked) and evaluated with dense-path-identical candidate
math on [64 px, 128 tri] VPU blocks into an in-register z-buffer with
deterministic min-id-at-max-z ties. No scatter, no atomics, no race (the
reference CUDA z-buffer race class, rasterize.h:143-154, is eliminated), and
no custom VJP — gradients flow through the JAX coefficient recompute
(rasterize.py).

Mosaic workarounds (this backend): no select on i1 vectors (boolean algebra
instead), dynamic DMA offsets must be provably 128-aligned.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stylerenderer_tpu.ops.rasterize_binned import _setup

TILE = 8
CHUNK = 128
TAIL_CHUNK = 512  # the single-tile tail kernel's per-DMA triangle count
_BIG_ID = np.float32(2**24)  # ids stored in f32; nf must stay below this
_NEG_INF = np.float32(-3.0e38)

def _dat_rows(n_attr: int) -> int:
    """Sublane count of the per-triangle data block: 10 fixed rows (px*3,
    py*3, z*3, id) + 3*n_attr per-corner attribute rows, padded to a
    multiple of 8 (min 16, the original fixed layout)."""
    return max(16, -(-(10 + 3 * n_attr) // 8) * 8)


# tier tile-span limits; a tile scans homes in a (span x span) neighborhood.
# tier 0 (single-tile triangles — the vast majority of a dense face mesh)
# costs exactly one home segment per tile.
TIER_SPANS = (1, 2, 4, 16)  # XL = everything bigger, scanned globally


def _tile_for(h: int, w: int) -> int:
    """Adaptive tile edge: keeps the scalar-prefetch ``starts`` array
    (5*ntiles+1 int32) SMEM-small at high resolution (<= ~20KB)."""
    m = max(h, w)
    if m <= 256:
        return TILE
    if m <= 512:
        return 16
    return 32


def build_bins(v, tri, h: int, w: int, perspective: bool, eps: float,
               tile: int = TILE):
    """-> (dat [B, 16, nf_pad] f32, starts [B, 4*ntiles+1] i32)."""
    nf = tri.shape[0]
    assert nf < _BIG_ID, "triangle ids are carried in f32"
    ntx, nty = w // tile, h // tile
    ntiles = ntx * nty

    def per_batch(vb):
        px, py, z, persp_ok, _x0, _y0, valid, span = _setup(
            vb, tri, h, w, perspective, eps
        )
        umin = jnp.min(px, -1)
        umax = jnp.max(px, -1)
        vmin = jnp.min(py, -1)
        vmax = jnp.max(py, -1)
        x0 = jnp.maximum(jnp.ceil(umin), 0.0).astype(jnp.int32)
        x1 = jnp.minimum(jnp.floor(umax), w - 1.0).astype(jnp.int32)
        y0 = jnp.maximum(jnp.ceil(vmin), 0.0).astype(jnp.int32)
        y1 = jnp.minimum(jnp.floor(vmax), h - 1.0).astype(jnp.int32)
        tx0, tx1 = x0 // tile, x1 // tile
        ty0, ty1 = y0 // tile, y1 // tile
        ts = jnp.maximum(tx1 - tx0, ty1 - ty0) + 1

        n_tiers = len(TIER_SPANS) + 1  # + XL
        tier = jnp.full(ts.shape, len(TIER_SPANS), jnp.int32)
        for k in range(len(TIER_SPANS) - 1, -1, -1):
            tier = jnp.where(ts <= TIER_SPANS[k], k, tier)
        # degenerate (|det| <= eps) triangles go to the XL tier: the hot
        # tiers then evaluate with the segment/point fallback compiled OUT
        # (same formula/grouping as _kernel_eval so routing == kernel math)
        px0, px1_, px2 = px[:, 0], px[:, 1], px[:, 2]
        py0_, py1_, py2_ = py[:, 0], py[:, 1], py[:, 2]
        a0 = px1_ * py2_ - py1_ * px2
        a1 = py0_ * px2 - px0 * py2_
        a2 = px0 * py1_ - py0_ * px1_
        det = a0 + a1 + a2
        sgn = jnp.where(det < 0, -1.0, 1.0)
        tier = jnp.where(det * sgn <= eps, len(TIER_SPANS), tier)
        home = ty0 * ntx + tx0
        key = jnp.where(valid, tier * ntiles + home, n_tiers * ntiles)

        # carry the feature columns THROUGH the sort (multi-operand sort is
        # ~1.6x faster on this chip than sort + row gather, and the output
        # is already triangle-on-lanes — no [nf,16]->[16,nf] transpose)
        ids = jnp.arange(nf, dtype=jnp.int32)
        ops = lax.sort(
            (key.astype(jnp.int32),
             px[:, 0], px[:, 1], px[:, 2],
             py[:, 0], py[:, 1], py[:, 2],
             z[:, 0], z[:, 1], z[:, 2], ids),
            num_keys=1,
        )
        key_sorted = ops[0]
        starts = jnp.searchsorted(
            key_sorted, jnp.arange(n_tiers * ntiles + 1, dtype=jnp.int32)
        ).astype(jnp.int32)

        zero = jnp.zeros((nf,), jnp.float32)
        full = jnp.stack(
            list(ops[1:10]) + [ops[10].astype(jnp.float32)] + [zero] * 6,
            axis=0,
        )  # [16, nf]
        return full, starts

    dat, starts = jax.vmap(per_batch)(v)
    pad = (-nf) % CHUNK + CHUNK  # guard chunk keeps aligned DMAs in-bounds
    dat = jnp.pad(dat, ((0, 0), (0, 0), (0, pad)))
    return dat, starts


def _kernel_eval(scr, Xf, Yf, h, w, perspective, eps, full=True):
    """Candidate evaluation on [px, 128 tri] blocks for the SINGLE-level
    kernel; mirrors rasterize._eval_candidate (same branches, same clamps)
    through the shared ``_level_setup``/``_level_pixels`` helpers (the
    multi-level kernel uses the same pair per level, so every kernel
    shares ONE copy of the candidate math).

    ``full=False`` compiles out the degenerate segment/point fallback
    (~40% of the VPU ops): build_bins routes every |det| <= eps triangle
    to the XL tier, which is the only range scanned with ``full=True`` —
    so each candidate still sees math identical to the dense oracle."""
    S = _level_setup(scr, float(w), float(h), 1.0, eps, full)
    return _level_pixels(S, Xf, Yf, perspective, eps, full)[:2]


def _kernel_depth(co0, co1, co2, z0, z1, z2, cov, perspective, eps):
    """Depth + final interpolation coefficients (mirrors the tail of
    ``rasterize._eval_candidate``: under perspective the coefficients are
    the perspective-corrected ``q_i * depth``, rasterize.h:132-140)."""
    if perspective:
        # vertices with z >= -eps were pre-culled in _setup (persp_ok)
        z0s = jnp.where(z0 < -eps, z0, -1.0)
        z1s = jnp.where(z1 < -eps, z1, -1.0)
        z2s = jnp.where(z2 < -eps, z2, -1.0)
        # reciprocal on the [1, CHUNK] per-triangle z rows, multiply on the
        # [P, CHUNK] pixels (lockstep with rasterize._eval_candidate)
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
    return depth, cov, co0, co1, co2


def _level_setup(scr, wl: float, hl: float, inv: float, eps, full):
    """Per-TRIANGLE setup of one pyramid level on [1, CHUNK] rows (scalar
    level scale). Identical f32 expressions to the dense oracle at that
    level — coords stored at the TOP level are rescaled
    ``px_l = (px + 0.5) * 2^-k - 0.5`` (power-of-two scaling is f32-exact,
    and rounding of ``a*b`` vs ``a*(b/2^k)`` is mantissa-identical), so
    winner maps stay bit-equal to projecting at the level directly.
    Setup is split from the per-pixel math (``_level_pixels``) so it runs
    exactly once per (chunk, level) regardless of how the pixel rows are
    blocked."""
    px0, px1, px2 = scr[0:1, :], scr[1:2, :], scr[2:3, :]
    py0, py1, py2 = scr[3:4, :], scr[4:5, :], scr[5:6, :]
    z0, z1, z2 = scr[6:7, :], scr[7:8, :], scr[8:9, :]
    if inv != 1.0:
        # (the top level skips the rescale entirely: x*1.0+0.0 is the
        # identity on every value except -0.0 -> +0.0, and skipping keeps
        # the expression stream exactly the dense oracle's)
        invf = np.float32(inv)
        sh = np.float32(invf * np.float32(0.5) - np.float32(0.5))
        px0 = px0 * invf + sh
        px1 = px1 * invf + sh
        px2 = px2 * invf + sh
        py0 = py0 * invf + sh
        py1 = py1 * invf + sh
        py2 = py2 * invf + sh

    a0 = px1 * py2 - py1 * px2
    a1 = py0 * px2 - px0 * py2
    a2 = px0 * py1 - py0 * px1
    det = a0 + a1 + a2
    front = det <= eps
    sign = jnp.where(det < 0, -1.0, 1.0)
    det_pos = det * sign
    b0 = (py1 - py2) * sign
    b1 = (py2 - py0) * sign
    b2 = (py0 - py1) * sign
    c0 = (px2 - px1) * sign
    c1 = (px0 - px2) * sign
    c2 = (px1 - px0) * sign
    a0, a1, a2 = a0 * sign, a1 * sign, a2 * sign

    umin = jnp.minimum(jnp.minimum(px0, px1), px2)
    umax = jnp.maximum(jnp.maximum(px0, px1), px2)
    vmin = jnp.minimum(jnp.minimum(py0, py1), py2)
    vmax = jnp.maximum(jnp.maximum(py0, py1), py2)
    x0 = jnp.maximum(jnp.ceil(umin), 0.0)
    x1 = jnp.minimum(jnp.floor(umax), wl - 1.0)
    y0 = jnp.maximum(jnp.ceil(vmin), 0.0)
    y1 = jnp.minimum(jnp.floor(vmax), hl - 1.0)
    bbox_ok = (x1 >= x0) & (y1 >= y0)
    nondeg = det_pos > eps
    base = dict(a0=a0, a1=a1, a2=a2, b0=b0, b1=b1, b2=b2,
                c0=c0, c1=c1, c2=c2, z0=z0, z1=z1, z2=z2,
                x0=x0, x1=x1, y0=y0, y1=y1,
                front=front, bbox_ok=bbox_ok, nondeg=nondeg)
    if not full:
        return base

    # degenerate fallback: per-triangle picks on [1, CHUNK]
    l0 = b0 * b0 + c0 * c0
    l1 = b1 * b1 + c1 * c1
    l2 = b2 * b2 + c2 * c2
    m0 = (l0 > l1) & (l0 > l2)
    m1 = jnp.logical_not(l0 > l1) & (l1 > l2)

    def pick(i0, i1, i2):
        return jnp.where(m0, i0, jnp.where(m1, i1, i2))

    base.update(
        m0=m0, m1=m1,
        b_i=pick(b0, b1, b2), c_i=pick(c0, c1, c2),
        seg=pick(l0, l1, l2) > eps,
        px_i=pick(px0, px1, px2), py_i=pick(py0, py1, py2),
        px_j=pick(px1, px2, px0), py_j=pick(py1, py2, py0),
        px_k=pick(px2, px0, px1), py_k=pick(py2, py0, py1),
    )
    return base


def _level_pixels(S, Xf, Yf, perspective, eps, full):
    """Per-PIXEL candidate math of one level's row group ``[rows, CHUNK]``
    against the setup ``S`` from ``_level_setup``. Returns
    (depth, cov, co0, co1, co2) — the final interpolation coefficients come
    for free from the depth computation, which is what lets the multi
    kernel interpolate attribute values in-loop instead of extracting
    winner rows."""
    in_bbox = ((Xf >= S["x0"]) & (Xf <= S["x1"])
               & (Yf >= S["y0"]) & (Yf <= S["y1"]))
    r0 = S["a0"] + S["b0"] * Xf + S["c0"] * Yf
    r1 = S["a1"] + S["b1"] * Xf + S["c1"] * Yf
    r2 = S["a2"] + S["b2"] * Xf + S["c2"] * Yf
    raw_ok = (r0 >= -eps) & (r1 >= -eps) & (r2 >= -eps)
    s = r0 + r1 + r2
    s_safe = jnp.where(jnp.abs(s) > 1e-30, s, 1.0)
    # one reciprocal + 3 muls, lockstep with rasterize._eval_candidate
    s_inv = 1.0 / s_safe
    cn0, cn1, cn2 = r0 * s_inv, r1 * s_inv, r2 * s_inv
    # sliver-cancellation clamp, mirrored from rasterize._eval_candidate
    # (see the comment there) — identical in every backend so winner maps
    # stay bit-equal
    cn0 = jnp.clip(cn0, -1.0, 2.0)
    cn1 = jnp.clip(cn1, -1.0, 2.0)
    cn2 = jnp.clip(cn2, -1.0, 2.0)
    nondeg = S["nondeg"]
    z0, z1, z2 = S["z0"], S["z1"], S["z2"]

    if not full:
        cov = S["front"] & S["bbox_ok"] & in_bbox & raw_ok & nondeg
        return _kernel_depth(cn0, cn1, cn2, z0, z1, z2, cov, perspective,
                             eps)

    m0, m1 = S["m0"], S["m1"]

    def pick(i0, i1, i2):
        return jnp.where(m0, i0, jnp.where(m1, i1, i2))

    seg = S["seg"]
    lj = -(Xf - S["px_k"]) * S["c_i"] + (Yf - S["py_k"]) * S["b_i"]
    lk = (Xf - S["px_j"]) * S["c_i"] - (Yf - S["py_j"]) * S["b_i"]
    lsum = lj + lk
    lsum_safe = jnp.where(jnp.abs(lsum) > 1e-30, lsum, 1.0)
    cj = jnp.clip(lj / lsum_safe, -1.0, 2.0)
    ck = jnp.clip(lk / lsum_safe, -1.0, 2.0)
    seg_ok = (cj >= -eps) & (ck >= -eps)
    dpt = (Xf - S["px_i"]) ** 2 + (Yf - S["py_i"]) ** 2
    pt_ok = dpt < eps

    zero = jnp.zeros_like(cj)
    one = jnp.ones_like(cj)
    seg0 = pick(zero, ck, cj)
    seg1 = pick(cj, zero, ck)
    seg2 = pick(ck, cj, zero)
    pt0 = pick(one, zero, zero)
    pt1 = pick(zero, one, zero)
    pt2 = pick(zero, zero, one)
    d0c = jnp.where(seg, seg0, pt0)
    d1c = jnp.where(seg, seg1, pt1)
    d2c = jnp.where(seg, seg2, pt2)
    deg_ok = (seg & seg_ok) | (jnp.logical_not(seg) & pt_ok)

    co0 = jnp.where(nondeg, cn0, d0c)
    co1 = jnp.where(nondeg, cn1, d1c)
    co2 = jnp.where(nondeg, cn2, d2c)
    cov = (S["front"] & S["bbox_ok"] & in_bbox & raw_ok
           & (nondeg | deg_ok))
    return _kernel_depth(co0, co1, co2, z0, z1, z2, cov, perspective, eps)


def _eval_levels(scr, blocks, Xf, Yf, perspective, eps, full):
    """All pyramid levels of one chunk: per-level setup + per-pixel eval,
    then ONE sublane concat so the winner update runs on the full
    ``[P_pad, CHUNK]`` block. ``blocks`` is the static
    (offset, P_k, tl, wl, inv) list from ``_multi_level_rows``; Xf/Yf are
    the full [P_pad, 1] row tables. Returns (depth, cov, co0, co1, co2) —
    the final interpolation coefficients come for free from the depth
    computation, which is what lets the multi kernel interpolate attribute
    values in-loop instead of extracting winner rows.

    Negative results (measured on chip, B=16 production mesh, attr
    pipeline, kept here so they are not retried): splitting the update
    into per-(level, y-group) blocks with a per-chunk ``lax.cond`` skip of
    y-groups no candidate bbox reaches measured 89.7 ms vs this
    structure's 58.0 — each cond forces the carried winner state through
    VMEM; even WITHOUT the conds the 9 small per-group winner updates
    measured 78.5 ms — Mosaic runs one wide concatenated update stream
    far better than many narrow ones."""
    outs = [[], [], [], [], []]
    for off, pk, tl, wl, inv in blocks:
        S = _level_setup(scr, float(wl), float(wl), inv, eps, full)
        res = _level_pixels(S, Xf[off:off + pk], Yf[off:off + pk],
                            perspective, eps, full)
        for acc, r in zip(outs, res):
            acc.append(r)
    if len(outs[0]) == 1:
        return tuple(acc[0] for acc in outs)
    return tuple(jnp.concatenate(acc, 0) for acc in outs)


def _make_kernel(h, w, ntx, nty, perspective, eps, tile=TILE):
    ntiles = ntx * nty

    def kernel(starts_ref, dat_ref, win_ref, scr_ref, sem):
        b = pl.program_id(0)
        t = pl.program_id(1)
        ty = t // ntx
        tx = t % ntx
        pix = jax.lax.broadcasted_iota(jnp.int32, (tile * tile, 1), 0)
        Xf = (tx * tile + pix % tile).astype(jnp.float32)  # [tile², 1]
        Yf = (ty * tile + pix // tile).astype(jnp.float32)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)

        def scan_range(state, start, end, full):
            """Stream triangles [start, end) through the z-buffer with
            double-buffered DMA (chunk c+1 in flight while c computes)."""
            c0 = start // CHUNK
            nchunks = jnp.where(
                end > start, (end - c0 * CHUNK + CHUNK - 1) // CHUNK, 0
            )

            def dma(c, slot):
                off = pl.multiple_of((c0 + c) * CHUNK, CHUNK)
                return pltpu.make_async_copy(
                    dat_ref.at[b, :, pl.ds(off, CHUNK)],
                    scr_ref.at[slot], sem.at[slot],
                )

            @pl.when(nchunks > 0)
            def _():
                dma(0, 0).start()

            def body(c, st):
                zb, wb = st
                slot = jax.lax.rem(c, 2)

                @pl.when(c + 1 < nchunks)
                def _():
                    dma(c + 1, 1 - slot).start()

                dma(c, slot).wait()
                scr = scr_ref[slot]
                off = pl.multiple_of((c0 + c) * CHUNK, CHUNK)
                depth, cov = _kernel_eval(scr, Xf, Yf, h, w, perspective,
                                          eps, full)
                pos = off + lane
                cov = cov & (pos >= start) & (pos < end)
                ids = scr[9:10, :]
                zm = jnp.where(cov, depth, _NEG_INF)  # [64, 128]
                zc = jnp.max(zm, axis=1, keepdims=True)  # [64, 1]
                idc = jnp.min(
                    jnp.where(cov & (zm == zc), ids, _BIG_ID),
                    axis=1, keepdims=True,
                )
                better = zc > zb
                equal = zc == zb
                wb = jnp.where(
                    better, idc, jnp.where(equal, jnp.minimum(wb, idc), wb)
                )
                zb = jnp.maximum(zb, zc)
                return zb, wb

            return jax.lax.fori_loop(0, nchunks, body, state)

        state = (
            jnp.full((tile * tile, 1), _NEG_INF, jnp.float32),
            jnp.full((tile * tile, 1), _BIG_ID, jnp.float32),
        )

        # tier neighborhoods: homes in rows [ty-span+1, ty], cols
        # [tx-span+1, tx]; one contiguous sorted segment per home row.
        # Hot tiers hold no degenerate triangles (routed to XL at binning
        # time) -> fast-path eval (full=False).
        for tier, span in enumerate(TIER_SPANS):
            base = tier * ntiles
            col_lo = jnp.maximum(tx - (span - 1), 0)

            def run_tier(state, base=base, span=span, col_lo=col_lo):
                for dy in range(span):
                    row = ty - dy
                    row_ok = row >= 0
                    row_safe = jnp.maximum(row, 0)
                    seg_lo = starts_ref[b, base + row_safe * ntx + col_lo]
                    seg_hi = starts_ref[b, base + row_safe * ntx + tx + 1]
                    seg_lo = jnp.where(row_ok, seg_lo, 0)
                    seg_hi = jnp.where(row_ok, seg_hi, 0)
                    state = scan_range(state, seg_lo, seg_hi, full=False)
                return state

            if span == 1:
                state = run_tier(state)
            else:
                # skip the whole tier when it is globally empty (one SMEM
                # scalar compare beats `span` empty loop setups per tile)
                tier_n = starts_ref[b, base + ntiles] - starts_ref[b, base]
                state = jax.lax.cond(
                    tier_n > 0, run_tier, lambda s: s, state
                )
        # XL tier (big + degenerate triangles): one global segment, full math
        n_tiers = len(TIER_SPANS) + 1
        state = scan_range(
            state,
            starts_ref[b, (n_tiers - 1) * ntiles],
            starts_ref[b, n_tiers * ntiles],
            full=True,
        )

        zb, wb = state
        win = jnp.where(zb > _NEG_INF, wb, -1.0).astype(jnp.int32)
        # out BlockSpec is (1, 1, tile, tile) indexed (b, t, 0, 0): the
        # kernel-visible block IS the per-(b, t) slice, so the store indexes
        # [0, 0] — indexing with b here would be OOB for every b >= 1 (the
        # ADVICE r4 high finding; dynamic-slice clamping masked it on CPU)
        win_ref[0, 0, :, :] = win.reshape(tile, tile)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("h", "w", "perspective", "eps")
)
def rasterize_winners_pallas(v, tri, h: int, w: int,
                             perspective: bool = False, eps: float = 1e-6):
    """Winner map [B, H, W] int32 (-1 background). Requires h, w % tile == 0
    (tile = 8 up to 256px, 16 up to 512px, 32 beyond — keeps the segment
    starts array SMEM-small at any resolution)."""
    tile = _tile_for(h, w)
    assert h % tile == 0 and w % tile == 0, (h, w, tile)
    v = lax.stop_gradient(v).astype(jnp.float32)
    tri = jnp.asarray(tri, jnp.int32)
    B = v.shape[0]
    ntx, nty = w // tile, h // tile
    ntiles = ntx * nty

    dat, starts = build_bins(v, tri, h, w, perspective, eps, tile)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, ntiles),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        # TPU blocks need full trailing dims: emit [B, ntiles, tile, tile]
        # and reassemble the image in JAX (a free relayout)
        out_specs=pl.BlockSpec(
            (1, 1, tile, tile), lambda b, t, starts: (b, t, 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 16, CHUNK), jnp.float32),  # double buffer
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    win = pl.pallas_call(
        _make_kernel(h, w, ntx, nty, perspective, eps, tile),
        out_shape=jax.ShapeDtypeStruct((B, ntiles, tile, tile), jnp.int32),
        grid_spec=grid_spec,
    )(starts, dat)
    win = win.reshape(B, nty, ntx, tile, tile)
    win = win.transpose(0, 1, 3, 2, 4).reshape(B, h, w)
    return win


def bin_overflow(v, tri, h, w, perspective=False, eps=1e-6):
    """Diagnostic kept for API compatibility: the home-tile scheme has no
    static capacities, so overflow is structurally impossible -> zeros."""
    B = jnp.asarray(v).shape[0] if jnp.asarray(v).ndim == 3 else 1
    return jnp.zeros((B, 3), jnp.int32)


# ---------------------------------------------------------------------------
# multi-level (pyramid) kernel: ONE binning + ONE streaming pass produces the
# winner maps of EVERY pyramid level (the GAR rasterizes the mesh at 4, 8,
# ..., size — reference model.py:260-270). Levels share the top level's NDC
# tile grid; each tile keeps one z-buffer per level stacked on the sublane
# axis, and each triangle chunk is DMA'd and evaluated against all levels at
# once. vs per-level calls: 1 sort instead of L, 1/L the DMA ranges, same
# total VPU work — and each level's winner map stays bit-identical to the
# dense oracle at that resolution (see _kernel_eval's multi-level note).
# ---------------------------------------------------------------------------


def _sparse_sp(top: int, wl: int, tile: int) -> tuple[int, int]:
    """Owned-tile stride/phase of a SPARSE pyramid level (one whose pixels
    are larger than a tile): level-k pixel ``p`` (k = log2(top/wl)) has its
    center at top coords ``(p+0.5)*2^k - 0.5``, which lies inside exactly
    ONE tile — ``tx = p*S + phase`` with ``S = 2^k/tile`` and
    ``phase = (2^(k-1)-1) // tile``. The tile that owns the center is the
    only tile whose worklist must evaluate that pixel: coverage of the
    center implies the center is inside the triangle's float bbox, so the
    bbox touches the owning tile and the triangle's home lies in the
    owning tile's span neighborhood — the exact invariant the dense levels
    rely on (see build_bins_multi)."""
    step = top // wl  # 2^k
    return step // tile, (step // 2 - 1) // tile


def _multi_level_rows(top: int, n_levels: int, tile: int, level0: int = 0):
    """Static per-pixel-row tables for ``n_levels`` pyramid levels starting
    at ``level0`` (level k renders ``top >> (level0+k)`` px from coords
    stored at the ``top`` scale).

    EVERY level's row block is padded to a multiple of 8 sublanes so the
    kernel can statically slice per-level blocks (Mosaic sublane slices must
    be 8-aligned) — the kernel evaluates each level separately: all
    per-TRIANGLE math runs once per level on ``[1, CHUNK]`` rows with the
    level's scalar 2^-k coordinate scale, and only the truly per-PIXEL math
    runs on ``[P_k, CHUNK]`` (an earlier revision rescaled coordinates on
    the full ``[P, CHUNK]`` grid first, which replicated ~60 per-triangle
    VPU ops across every pixel row — measured ~2.4x the whole z-scan).
    Dead pad rows get xoff far outside any level's bbox clamp, so their
    coverage is identically false.

    Levels with pixels LARGER than a tile (``tile >> k == 0`` — the 8/4 px
    pyramid tail at top=256/tile=16) are SPARSE: each of their pixels is
    owned by exactly one tile (see ``_sparse_sp``), so they cost one 8-row
    block whose single live row is active only on owning tiles. This is
    what lets the whole pyramid run in ONE kernel pass (the earlier design
    ran a second single-tile kernel streaming the whole mesh again for
    these levels — measured ~4.3 ms/16 imgs of pure re-scan).

    Returns (P_pad, offsets per level, blocks, inv [P,1], wl [P,1],
    hl [P,1], xoff [P,1], yoff [P,1], tl [P,1]) as numpy f32 — row p of a
    tile handles pixel (xoff, yoff) within that tile at level k(p);
    ``blocks[k] = (offset, padded rows, tl, wl, inv)`` mirrors the same
    layout statically (``tl = 0`` marks a sparse level)."""
    rows_inv, rows_w, rows_h, rows_x, rows_y, rows_t = [], [], [], [], [], []
    offsets = []
    blocks = []
    p = 0
    for k in range(n_levels):
        tl = tile >> k
        wl = top >> (level0 + k)
        offsets.append(p)
        pk = -(-(tl * tl) // 8) * 8 if tl else 8
        blocks.append((p, pk, tl, wl, 1.0 / (1 << (level0 + k))))
        n_live = tl * tl if tl else 0  # sparse live rows are tile-dependent
        for i in range(n_live):
            rows_inv.append(1.0 / (1 << (level0 + k)))
            rows_w.append(wl)
            rows_h.append(wl)
            rows_x.append(i % tl)
            rows_y.append(i // tl)
            rows_t.append(tl)
        for _ in range(pk - n_live):  # per-level dead rows
            rows_inv.append(1.0 / (1 << (level0 + k)))
            rows_w.append(wl)
            rows_h.append(wl)
            rows_x.append(1.0e9)  # in_bbox (X <= x1 <= wl-1) always false
            rows_y.append(1.0e9)
            rows_t.append(tl)
        p += pk
    P_pad = p

    def col(a):
        return np.asarray(a, np.float32).reshape(P_pad, 1)

    return (P_pad, offsets, blocks, col(rows_inv), col(rows_w), col(rows_h),
            col(rows_x), col(rows_y), col(rows_t))


MULTI_TIER_SPANS = (1, 2)  # spans > 2 go to XL: rare on face meshes, and
# each extra tier costs span x span mostly-empty range scans per tile

# multi-kernel tier table: (key offset, span, full candidate math?).
# Degenerate triangles need the segment/point fallback (full math) but are
# usually SMALL (mesh pole slivers) — giving them their own span-2 tier
# keeps them out of the XL segment, which every tile scans globally
# (measured: ~560 degenerate pole triangles on the synthetic face put ~60%
# of all chunk evaluations into XL). ONE deg tier, not a span-1/span-2
# pair: per-RANGE setup costs ~0.2 us (benchmarks/probe_ranges.py: 19.4 ms
# on an all-culled mesh vs 2.67 ms bare pipeline), so a span-1 + span-2
# tier pair costs 3 range setups per tile whenever ANY degenerate exists
# (~100 pole slivers on the production mesh) — one span-2 tier costs 2 and
# scans each deg triangle by at most 4 tiles (pop is ~0.1% of candidates,
# so the extra evals are noise next to 256 fewer setups per image).
MULTI_TIERS = (
    (0, 1, False),  # fast span-1 (vast majority)
    (1, 2, False),  # fast span-2
    (2, 2, True),   # degenerate (any span <= 2)
)
MULTI_N_TIERS = len(MULTI_TIERS) + 1  # + XL (global, full math)


def build_bins_multi(v, tri, top: int, n_levels: int, perspective: bool,
                     eps: float, tile: int, attrs=None):
    """Binning for the multi-level kernel -> (dat, starts), same layout as
    ``build_bins`` but valid for EVERY pyramid level:

    - NO bbox pad is needed for coarse levels: a level-k pixel owned by tile
      (tx, ty) has its center at top-coords ``(x_l+0.5)*2^k - 0.5`` which
      always lies INSIDE that tile's top-level pixel range (centers step
      ``2^k`` starting at ``2^{k-1}-0.5 < tile``), and the kernel's
      per-level bbox clamp (``x_l >= ceil(umin_l)`` <=> center >= umin)
      only covers pixels whose center is inside the float bbox — so a
      triangle can only cover pixels of tiles its unpadded top-level bbox
      intersects, exactly as in the single-level scheme. (An earlier
      revision padded left/up by ``2^{kmax-1}-0.5`` px, which pushed most
      1-2 px triangles into tier 1 and ~3x'd the candidate reads.)
    - validity is the union over levels (a sliver can miss every top-level
      pixel center yet hit a coarse one);
    - degenerate routing to the XL (full-math) tier uses the COARSEST
      level's det scale (det shrinks by 4^k), so hot tiers stay free of
      any triangle that is degenerate at ANY level.
    """
    nf = tri.shape[0]
    assert nf < _BIG_ID, "triangle ids are carried in f32"
    ntx = nty = top // tile
    ntiles = ntx * nty
    kmax = n_levels - 1
    det_scale = float(4 ** kmax)
    n_attr = 0 if attrs is None else attrs.shape[-1]
    n_rows = _dat_rows(n_attr)

    def per_batch(vb, av):
        px, py, z, persp_ok, _x0, _y0, _valid, _span = _setup(
            vb, tri, top, top, perspective, eps
        )
        umin = jnp.min(px, -1)
        umax = jnp.max(px, -1)
        vmin = jnp.min(py, -1)
        vmax = jnp.max(py, -1)

        # union-over-levels validity: bbox_ok at ANY level
        bbox_any = jnp.zeros(umin.shape, bool)
        for k in range(n_levels):
            inv = 1.0 / (1 << k)
            wl = top >> k
            u0 = (umin + 0.5) * inv - 0.5
            u1 = (umax + 0.5) * inv - 0.5
            v0 = (vmin + 0.5) * inv - 0.5
            v1 = (vmax + 0.5) * inv - 0.5
            ok = (
                (jnp.minimum(jnp.floor(u1), wl - 1.0)
                 >= jnp.maximum(jnp.ceil(u0), 0.0))
                & (jnp.minimum(jnp.floor(v1), wl - 1.0)
                   >= jnp.maximum(jnp.ceil(v0), 0.0))
            )
            bbox_any = bbox_any | ok
        nv = vb.shape[0]
        idx_ok = jnp.all((tri >= 0) & (tri < nv), axis=-1)

        px0, px1_, px2 = px[:, 0], px[:, 1], px[:, 2]
        py0_, py1_, py2_ = py[:, 0], py[:, 1], py[:, 2]
        a0 = px1_ * py2_ - py1_ * px2
        a1 = py0_ * px2 - px0 * py2_
        a2 = px0 * py1_ - py0_ * px1_
        det = a0 + a1 + a2
        # front at ANY level: det * 4^-k <= eps for some k <= kmax
        front_any = det <= eps * det_scale
        valid = idx_ok & persp_ok & bbox_any & front_any

        # float-bbox tile extent (floor, not ceil: tile intersection, which
        # is what coarse-level coverage requires — see docstring)
        x0 = jnp.maximum(jnp.floor(umin), 0.0).astype(jnp.int32)
        x1 = jnp.minimum(jnp.floor(umax), top - 1.0).astype(jnp.int32)
        y0 = jnp.maximum(jnp.floor(vmin), 0.0).astype(jnp.int32)
        y1 = jnp.minimum(jnp.floor(vmax), top - 1.0).astype(jnp.int32)
        x1 = jnp.maximum(x1, x0)  # keep spans sane for off-screen tris
        y1 = jnp.maximum(y1, y0)
        tx0, tx1 = x0 // tile, x1 // tile
        ty0, ty1 = y0 // tile, y1 // tile
        ts = jnp.maximum(tx1 - tx0, ty1 - ty0) + 1

        n_tiers = MULTI_N_TIERS
        xl = n_tiers - 1
        # fast tiers by tile span; degenerate AT ANY LEVEL (det shrinks by
        # 4^k) needs the segment/point fallback -> the full-math small
        # tier (2) or XL if also big
        sgn = jnp.where(det < 0, -1.0, 1.0)
        deg = det * sgn <= eps * det_scale
        tier = jnp.where(ts <= 1, 0, jnp.where(ts <= 2, 1, xl))
        tier_deg = jnp.where(ts <= 2, 2, xl)
        tier = jnp.where(deg, tier_deg, tier)
        home = ty0 * ntx + tx0
        key = jnp.where(valid, tier * ntiles + home, n_tiers * ntiles)

        ids = jnp.arange(nf, dtype=jnp.int32)
        # fused-interp mode: the 3C per-corner attribute values ride THROUGH
        # the sort as extra operands. TPU gathers cost ~fixed time per INDEX
        # (measured ~2 GB/s on small rows), so the alternative — gathering
        # attrs after the sort via tri[ids_sorted] — costs two gathers of
        # B*nf*3 indices (~49 ms on the production mesh); operand-carry costs
        # only the sort's extra data movement (~1.6x cheaper, see
        # benchmarks/profile_sort.py)
        extra = ()
        if n_attr:
            # av arrives [3C, nf] per batch item (nf minor, corner-major /
            # channel-minor — the kernel's scr rows 10..9+3C order)
            extra = tuple(av[i] for i in range(3 * n_attr))
        ops = lax.sort(
            (key.astype(jnp.int32),
             px[:, 0], px[:, 1], px[:, 2],
             py[:, 0], py[:, 1], py[:, 2],
             z[:, 0], z[:, 1], z[:, 2], ids) + extra,
            num_keys=1,
        )
        key_sorted = ops[0]
        starts = jnp.searchsorted(
            key_sorted, jnp.arange(n_tiers * ntiles + 1, dtype=jnp.int32)
        ).astype(jnp.int32)
        ids_sorted = ops[10]
        rows = list(ops[1:10]) + [ids_sorted.astype(jnp.float32)]
        rows += list(ops[11:])
        zero = jnp.zeros((nf,), jnp.float32)
        rows += [zero] * (n_rows - len(rows))
        return jnp.stack(rows, axis=0), starts

    if attrs is None:
        dat, starts = jax.vmap(lambda vb: per_batch(vb, None))(v)
    else:
        # Corner-attribute prep: THREE batch-shared gathers along the
        # MINOR axis of an [B*C, nv] source (one per triangle corner, nf
        # indices each), producing [B, C, nf] blocks that are already in
        # the exact layout the sort operands need — nf minor, no
        # post-gather relayout. Measured (benchmarks/probe_binsplit2, 16
        # imgs, nf=100k): this prep costs +2.6 ms over the bare 20-operand
        # sort, vs +12.8 ms for the previous single [3nf]-index gather
        # whose [.., B*C]-minor result had to be transposed to nf-minor
        # (a major<->minor relayout XLA runs ~10 ms slower; profile_fused
        # never saw it because a closed-over `norm` let XLA fold the whole
        # prep at compile time).
        ab = attrs.astype(jnp.float32)
        B, nv, C = ab.shape
        src = ab.transpose(0, 2, 1).reshape(B * C, nv)  # [B*C, nv] nv-minor
        avs = jnp.concatenate(
            [src[:, jnp.clip(tri[:, k], 0, nv - 1)].reshape(B, C, nf)
             for k in range(3)],
            axis=1,
        )  # [B, 3C, nf], corner-major / channel-minor
        dat, starts = jax.vmap(per_batch)(v, avs)
    # guard padding sized for the LARGEST chunk any consumer kernel streams
    # (the tail kernel reads TAIL_CHUNK-aligned blocks from offset 0)
    padn = (-nf) % TAIL_CHUNK + TAIL_CHUNK
    dat = jnp.pad(dat, ((0, 0), (0, 0), (0, padn)))
    return dat, starts


def _make_kernel_multi(top, n_levels, ntx, nty, perspective, eps, tile, B,
                       n_attr=0, level0=0, chunk=CHUNK):
    """n_attr=0: winner-id kernel. n_attr=C: row-extraction kernel — the
    scan state carries the WINNING TRIANGLE'S ENTIRE DATA ROW (projected
    corner coords + per-corner attributes), extracted per chunk with ONE
    MXU contraction ``pick[P,CHUNK] @ chunk[R,CHUNK]^T`` (pick is the
    winner's one-hot lane mask, so the product IS the winner's row).
    Interpolation coefficients are then recomputed OUTSIDE the kernel on
    dense per-pixel shapes — no per-pixel gather ever happens, and the
    z-scan stays as cheap as the winner-only kernel (the earlier in-scan
    interpolation variant recomputed coefficients for every chunk and
    carried value columns through the scan: measured ~2.6x the winner-only
    kernel; row extraction adds ~10%).

    ``chunk`` is the per-DMA triangle count (the tail kernel streams the
    whole mesh through ONE tile per batch, so it uses bigger chunks to
    amortize the scan-loop overhead)."""
    ntiles = ntx * nty
    (P_pad, _offsets, blocks, inv_np, wl_np, hl_np, xoff_np, yoff_np,
     tl_np) = _multi_level_rows(top, n_levels, tile, level0)

    def kernel(starts_ref, dat_ref, win_ref, scr_ref, sem):
        t = pl.program_id(0)
        ty = t // ntx
        tx = t % ntx
        # per-row pixel coordinates, derived from iota + the static level
        # table instead of a prefetched [P_pad, 8] block (the block was
        # re-DMA'd every grid step — pure overhead at 4096 steps/batch)
        p_iota = jax.lax.broadcasted_iota(jnp.int32, (P_pad, 1), 0)
        txf = jnp.full((P_pad, 1), tx, jnp.float32)
        tyf = jnp.full((P_pad, 1), ty, jnp.float32)
        Xf = jnp.zeros((P_pad, 1), jnp.float32)
        Yf = jnp.zeros((P_pad, 1), jnp.float32)
        big = jnp.float32(1.0e9)
        for off, pk, tl, wl, inv in blocks:
            pl_local = p_iota - off
            in_blk = (p_iota >= off) & (p_iota < off + pk)
            if tl:
                live = pl_local < tl * tl  # per-level dead pad rows
                x_l = (pl_local % tl).astype(jnp.float32)
                y_l = (pl_local // tl).astype(jnp.float32)
                # dead/pad rows get coords far outside every bbox clamp, so
                # their coverage is identically false (_multi_level_rows)
                x_l = jnp.where(live, x_l, big)
                y_l = jnp.where(live, y_l, big)
                Xf = jnp.where(in_blk, txf * tl + x_l, Xf)
                Yf = jnp.where(in_blk, tyf * tl + y_l, Yf)
            else:
                # SPARSE level (pixel larger than a tile): row `off` is the
                # level pixel owned by this tile, if any (_sparse_sp); all
                # other rows (and non-owning tiles) are dead.
                S, phase = _sparse_sp(top, wl, tile)
                shift = S.bit_length() - 1
                own_x = (tx >= phase) & (((tx - phase) & (S - 1)) == 0)
                own_y = (ty >= phase) & (((ty - phase) & (S - 1)) == 0)
                px_l = ((tx - phase) >> shift).astype(jnp.float32)
                py_l = ((ty - phase) >> shift).astype(jnp.float32)
                live = pl_local == 0
                x_l = jnp.where(live & own_x & own_y, px_l, big)
                y_l = jnp.where(live & own_x & own_y, py_l, big)
                Xf = jnp.where(in_blk, x_l, Xf)
                Yf = jnp.where(in_blk, y_l, Yf)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
        tile_px = tile * (1 << level0)  # tile edge in TOP-level pixels

        def per_b(b, carry):
            # the whole per-batch-item sweep runs INSIDE one grid step:
            # grid is (ntiles,) and b is a fori_loop index, so the
            # [P_pad, 1]-shaped row setup above (and every other per-tile
            # fixed cost: grid bookkeeping, output block DMA) is paid once
            # per TILE instead of once per (batch, tile) — measured 17.4 ms
            # of pure per-step overhead per 16 imgs on an all-culled mesh
            # (benchmarks/probe_ranges.py) before this fold.
            def scan_ranges(state, ranges, chunk_body, prefilter=False):
                """Stream a LIST of sorted-array ranges through ONE fori_loop:
                per-chunk scalar selects map the flat chunk index to its range's
                DMA offset and [start, end) mask. One loop instead of one per
                range matters because every loop/cond boundary forces the
                carried [P_pad, 1+1+C] winner state through VMEM (~0.6 us each,
                measured: benchmarks/probe_ranges.py — 19.4 ms/16 imgs of pure
                range setup on an all-culled mesh); empty ranges now cost a few
                scalar ops instead of a loop setup, so the per-tier global-empty
                lax.cond guards are gone too."""
                c0s, ns, cums = [], [], []
                total = jnp.int32(0)
                for (start, end) in ranges:
                    c0 = start // chunk
                    n = jnp.where(
                        end > start, (end - c0 * chunk + chunk - 1) // chunk, 0
                    )
                    c0s.append(c0)
                    ns.append(n)
                    cums.append(total)
                    total = total + n

                def pick(c):
                    """(aligned chunk base, range start, range end) for flat
                    chunk index c via a scalar select chain."""
                    base, lo, hi = c0s[0] + c, ranges[0][0], ranges[0][1]
                    for r in range(1, len(ranges)):
                        in_r = c >= cums[r]
                        base = jnp.where(in_r, c0s[r] + (c - cums[r]), base)
                        lo = jnp.where(in_r, ranges[r][0], lo)
                        hi = jnp.where(in_r, ranges[r][1], hi)
                    return base, lo, hi

                def dma(cbase, slot):
                    off = pl.multiple_of(cbase * chunk, chunk)
                    return pltpu.make_async_copy(
                        dat_ref.at[b, :, pl.ds(off, chunk)],
                        scr_ref.at[slot], sem.at[slot],
                    )

                @pl.when(total > 0)
                def _():
                    dma(pick(jnp.int32(0))[0], 0).start()

                def body(c, st):
                    slot = jax.lax.rem(c, 2)

                    @pl.when(c + 1 < total)
                    def _():
                        dma(pick(c + 1)[0], 1 - slot).start()

                    cbase, start, end = pick(c)
                    dma(cbase, slot).wait()
                    scr = scr_ref[slot]
                    off = pl.multiple_of(cbase * chunk, chunk)
                    pos = off + lane

                    def evaluate(st):
                        return chunk_body(scr, pos, start, end, st)

                    if not prefilter:
                        return evaluate(st)
                    # XL chunks are scanned by EVERY tile but a big triangle
                    # touches only the tiles its top-level float bbox overlaps:
                    # a dozen [1, CHUNK] ops + one reduce skip the whole
                    # [P_pad, CHUNK] eval when no lane's bbox reaches this tile
                    # (coverage at any level implies a pixel center inside the
                    # bbox, and every level's centers lie inside the tile's
                    # top-level pixel span — build_bins_multi docstring; +-1
                    # slack absorbs the boundary rounding). Degenerate-tier
                    # chunks share the loop and the filter — it is pure bbox
                    # logic, correct for the segment/point fallback too (their
                    # coverage also requires in_bbox).
                    pxmin = jnp.minimum(jnp.minimum(scr[0:1], scr[1:2]),
                                        scr[2:3])
                    pxmax = jnp.maximum(jnp.maximum(scr[0:1], scr[1:2]),
                                        scr[2:3])
                    pymin = jnp.minimum(jnp.minimum(scr[3:4], scr[4:5]),
                                        scr[5:6])
                    pymax = jnp.maximum(jnp.maximum(scr[3:4], scr[4:5]),
                                        scr[5:6])
                    tx0f = (tx * tile_px).astype(jnp.float32)
                    ty0f = (ty * tile_px).astype(jnp.float32)
                    touch = (
                        (pxmax >= tx0f - 1.0) & (pxmin <= tx0f + tile_px)
                        & (pymax >= ty0f - 1.0) & (pymin <= ty0f + tile_px)
                        & (pos >= start) & (pos < end)
                    )
                    any_touch = jnp.max(
                        jnp.where(touch, 1.0, 0.0).astype(jnp.float32)
                    ) > 0.0
                    return jax.lax.cond(any_touch, evaluate, lambda s: s, st)

                return jax.lax.fori_loop(0, total, body, state)

            def tier_ranges(tier, span):
                """This tile's (start, end) sorted-array segments for one tier:
                one contiguous segment per home row in the span neighborhood."""
                base = tier * ntiles
                col_lo = jnp.maximum(tx - (span - 1), 0)
                out = []
                for dy in range(span):
                    row = ty - dy
                    row_ok = row >= 0
                    row_safe = jnp.maximum(row, 0)
                    seg_lo = starts_ref[b, base + row_safe * ntx + col_lo]
                    seg_hi = starts_ref[b, base + row_safe * ntx + tx + 1]
                    out.append((jnp.where(row_ok, seg_lo, 0),
                                jnp.where(row_ok, seg_hi, 0)))
                return out

            fast_ranges, full_ranges = [], []
            for tier, span, full_math in MULTI_TIERS:
                (full_ranges if full_math else fast_ranges).extend(
                    tier_ranges(tier, span))
            full_ranges.append((starts_ref[b, (MULTI_N_TIERS - 1) * ntiles],
                                starts_ref[b, MULTI_N_TIERS * ntiles]))

            def sweep(state, make_body):
                """One pass over every segment this tile owns: all fast-math
                tiers in ONE merged loop, then degenerate + XL in a second
                full-math merged loop (with the per-chunk bbox prefilter)."""
                state = scan_ranges(state, fast_ranges, make_body(False))
                return scan_ranges(
                    state, full_ranges, make_body(True),
                    # the tail kernel's one tile covers the whole image — nothing
                    # to skip there
                    prefilter=ntiles > 1,
                )

            # one z-scan sweep; with attrs the winner's interpolated values are
            # computed IN-LOOP: the interpolation coefficients are exactly the
            # clamped barycentrics the depth computation already produced, so
            # per-chunk interpolation costs 6 FMAs/channel on [P, CHUNK] plus
            # one exact one-hot lane reduction per channel — the earlier
            # winner-ROW extraction (3-pass exact-split MXU contraction per
            # chunk, then an out-of-kernel coefficient recompute) measured
            # ~20 ms of the B=16 pyramid and is gone entirely.
            def eval_body(full):
                def body_fn(scr, pos, start, end, st):
                    zb, wb = st[0], st[1]
                    depth, cov, co0, co1, co2 = _eval_levels(
                        scr, blocks, Xf, Yf, perspective, eps, full)
                    cov = cov & (pos >= start) & (pos < end)
                    ids = scr[9:10, :]
                    zm = jnp.where(cov, depth, _NEG_INF)  # [P_pad, CHUNK]
                    zc = jnp.max(zm, axis=1, keepdims=True)
                    idc = jnp.min(
                        jnp.where(cov & (zm == zc), ids, _BIG_ID),
                        axis=1, keepdims=True,
                    )
                    better = zc > zb
                    equal = zc == zb
                    new = list(st)
                    if n_attr:
                        sel = better | (equal & (idc < wb))
                        # exactly one lane matches (idc is the unique min id at
                        # max depth), so the masked lane sum IS the winner's
                        # value — exact, no rounding. The interpolation
                        # expression (co0*A0 + co1*A1) + co2*A2 mirrors the
                        # dense oracle's `_interp_from_win` order bit-for-bit.
                        pick = cov & (zm == zc) & (ids == idc)
                        cols = []
                        for c in range(n_attr):
                            a0 = scr[10 + c:11 + c, :]
                            a1 = scr[10 + n_attr + c:11 + n_attr + c, :]
                            a2 = scr[10 + 2 * n_attr + c:11 + 2 * n_attr + c, :]
                            valc = co0 * a0 + co1 * a1 + co2 * a2
                            cols.append(jnp.sum(
                                jnp.where(pick, valc, 0.0),
                                axis=1, keepdims=True,
                            ))
                        vals_c = jnp.concatenate(cols, axis=1)  # [P_pad, C]
                        new[2] = jnp.where(sel, vals_c, st[2])
                    new[1] = jnp.where(
                        better, idc, jnp.where(equal, jnp.minimum(wb, idc), wb))
                    new[0] = jnp.maximum(zb, zc)
                    return tuple(new)

                return body_fn

            # empty-(b, tile) fast exit: when every range this tile owns is
            # empty (typical for ~half the tiles of a portrait render — the
            # background — and for ALL tiles on a fully-culled mesh), skip
            # both scan loops entirely. Each fori_loop boundary forces the
            # carried [P_pad, 1+1+C] winner state through VMEM even at zero
            # trips (~0.6 us each, benchmarks/probe_ranges.py), so the skip
            # removes the whole in-kernel fixed cost, leaving only the
            # scalar range reads + the background store. XL is usually empty
            # on real meshes (degenerates are routed to their own small
            # tier), so the XL term rarely defeats the test.
            total_all = jnp.int32(0)
            for lo, hi in fast_ranges + full_ranges:
                total_all = total_all + (hi - lo)

            if n_attr:
                bg = jnp.concatenate(
                    [jnp.zeros((P_pad, n_attr), jnp.float32),
                     jnp.full((P_pad, 1), -1.0, jnp.float32)], axis=1)
            else:
                bg = jnp.full((P_pad, 1), -1, jnp.int32)

            @pl.when(total_all == 0)
            def _():
                win_ref[b, 0, :, :] = bg

            @pl.when(total_all > 0)
            def _():
                state = (
                    jnp.full((P_pad, 1), _NEG_INF, jnp.float32),
                    jnp.full((P_pad, 1), _BIG_ID, jnp.float32),
                ) + ((jnp.zeros((P_pad, n_attr), jnp.float32),)
                     if n_attr else ())
                state = sweep(state, eval_body)
                zb, wb = state[0], state[1]
                if n_attr:
                    # cols 0..C-1: interpolated values (0 background); col C:
                    # winner id (-1 background) — ids < 2^24 exact in f32
                    vals = jnp.concatenate([state[2], wb], axis=1)
                    win_ref[b, 0, :, :] = jnp.where(zb > _NEG_INF, vals, bg)
                else:
                    win = jnp.where(zb > _NEG_INF, wb, -1.0).astype(jnp.int32)
                    win_ref[b, 0, :, :] = win
            return carry

        jax.lax.fori_loop(0, B, per_b, 0)

    return kernel, P_pad


@functools.partial(
    jax.jit, static_argnames=("top", "n_levels", "perspective", "eps",
                              "interpret", "main_chunk", "tile")
)
def rasterize_winners_pallas_multi(v, tri, top: int, n_levels: int,
                                   perspective: bool = False,
                                   eps: float = 1e-6,
                                   interpret: bool = False,
                                   attrs=None, main_chunk: int = CHUNK,
                                   tile: int | None = None):
    """Winner maps — or fused interpolated value maps — for the whole
    pyramid in one kernel pass.

    ``attrs=None``: returns a list of ``n_levels`` winner maps
    ``[B, top>>k, top>>k]`` int32 (-1 background), k = 0..n_levels-1 — each
    bit-identical to ``rasterize_winners`` (the dense oracle) at that
    resolution.

    ``attrs=[B, nv, C]``: fused mode — the kernel interpolates the winning
    triangle's per-vertex attributes in-register and returns
    ``(values [B, s, s, C] f32, winner [B, s, s] int32)`` per level
    (0 / -1 on background). This skips the entire per-pixel gather +
    coefficient-recompute pass on the forward; the winner map lets
    ``rasterize_pyramid_fused`` recompute interpolation-only gradients on
    the backward (custom VJP).

    Constraints: ``top`` a multiple of 16. Levels the TILED kernel can hold
    go down to 1 px/tile; DEEPER levels (the pyramid's 8/4 px tail) run in a
    second single-tile pass over the SAME binned data — one whole-mesh
    stream per batch with big DMA chunks, replacing the dense per-level
    search (which at these sizes is HBM-bound on [nf, s*s] intermediates).
    """
    if tile is None:
        # tile 16 keeps the top-level row block at 256 sublanes; big
        # images use 32 so the grid stays <= 32x32 tiles (the per-tile
        # fixed cost — see benchmarks/profile_overhead.py — would
        # otherwise dominate). Overridable for tests/experiments.
        tile = 16 if top <= 256 else 32
    assert top % tile == 0, (top, tile)
    assert (top >> (n_levels - 1)) >= 1, "level below 1 px"
    v = lax.stop_gradient(v).astype(jnp.float32)
    tri = jnp.asarray(tri, jnp.int32)
    B = v.shape[0]
    ntx = nty = top // tile
    ntiles = ntx * nty
    n_attr = 0
    if attrs is not None:
        attrs = lax.stop_gradient(jnp.asarray(attrs))
        n_attr = attrs.shape[-1]
        assert attrs.shape[:2] == v.shape[:2], (attrs.shape, v.shape)
        assert n_attr <= 7, "fused interpolation supports <= 7 channels"
    n_rows = _dat_rows(n_attr)
    out_ch = n_attr + 1 if n_attr else 1

    dat, starts = build_bins_multi(v, tri, top, n_levels, perspective, eps,
                                   tile, attrs=attrs)

    def run(n_lv, tile_k, ntx_k, level0, starts_k, chunk):
        kernel, P_pad = _make_kernel_multi(
            top, n_lv, ntx_k, ntx_k, perspective, eps, tile_k, B,
            n_attr=n_attr, level0=level0, chunk=chunk,
        )
        offs = _multi_level_rows(top, n_lv, tile_k, level0)[1]
        ntl = ntx_k * ntx_k
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            # batch is folded INSIDE each grid step (fori_loop in the
            # kernel): the per-step fixed cost — row-coordinate setup,
            # grid bookkeeping, output-block handling — is paid per TILE,
            # not per (batch, tile)
            grid=(ntl,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(
                (B, 1, P_pad, out_ch), lambda t, starts: (0, t, 0, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((2, n_rows, chunk), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        win = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(
                (B, ntl, P_pad, out_ch),
                jnp.float32 if n_attr else jnp.int32,
            ),
            grid_spec=grid_spec,
            # [P_pad, 1] row temporaries are lane-padded to [P_pad, 128] in
            # VMEM (~0.7 MB each at tile=32), so the tile-32 kernel's stack
            # peaks just past the default 16 MB scoped-vmem limit; the chip
            # has 128 MB VMEM and profiling shows no pipelining loss at 32
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=32 * 1024 * 1024,
            ),
            interpret=interpret,
        )(starts_k, dat)
        return win, offs

    # ONE kernel pass covers every level: levels with >= 1 px/tile are dense
    # row blocks; deeper levels (the 8/4 px pyramid tail) are SPARSE rows
    # evaluated only by the tile that owns each coarse pixel's center (see
    # _sparse_sp — the home-neighborhood invariant covers their candidate
    # sets too, so no second whole-mesh pass is needed).
    win, offsets = run(n_levels, tile, ntx, 0, starts, main_chunk)

    outs = []
    for k in range(n_levels):
        sl = top >> k
        tl = tile >> k
        if tl:
            w_k = win[:, :, offsets[k]:offsets[k] + tl * tl, :]
            w_k = w_k.reshape(B, nty, ntx, tl, tl, out_ch)
            w_k = w_k.transpose(0, 1, 3, 2, 4, 5).reshape(B, sl, sl, out_ch)
        else:
            S, phase = _sparse_sp(top, sl, tile)
            w_k = win[:, :, offsets[k], :].reshape(B, nty, ntx, out_ch)
            w_k = w_k[:, phase::S, phase::S, :]  # [B, sl, sl, C]
        if n_attr:
            win_k = w_k[..., n_attr].astype(jnp.int32)
            outs.append((w_k[..., :n_attr], win_k))
        else:
            outs.append(w_k[..., 0])
    return outs
