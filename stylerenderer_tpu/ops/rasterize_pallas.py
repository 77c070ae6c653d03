"""Pallas TPU rasterizer: per-tile VMEM z-buffer over sort-binned triangles.

The production winner search. Design (see also rasterize.py docstring):

JAX-side binning (vectorized, ~2ms/img at BFM scale):
  1. per-triangle setup: projected verts, validity, clamped integer bbox;
  2. tier expansion — every triangle emits (tile, tri) entries for the 8x8
     image tiles its bbox overlaps, through static-capacity tiers:
     A: <=2x2 tiles (4 slots, all triangles),
     M: <=4x4 tiles (16 slots, top ``med_cap`` by span),
     L: <=16x16 tiles (256 slots, top ``lg_cap``),
     XL: all tiles (``xl_cap``); dense face meshes are ~100% tier A;
  3. one ``lax.sort`` by tile id + ``searchsorted`` segment starts;
  4. pre-gather per-entry data as ``[16, E]`` f32 (entries on lanes):
     rows 0-2 px, 3-5 py, 6-8 z(ndc), 9 triangle id.

Pallas kernel (grid = (B, n_tiles)):
  - scalar-prefetched segment starts;
  - streams each tile's entry chunks HBM->VMEM (async copy, 128 entries);
  - evaluates the same candidate math as the dense path on [64 px, 128
    entry] vector blocks (VPU-native layout);
  - keeps an in-register z-buffer + winner id with deterministic
    min-id-at-max-z ties — no scatter, no atomics, no race (the reference's
    CUDA z-buffer race class, rasterize.h:143-154, is eliminated).

No custom VJP needed: the winner search is non-differentiable by design;
gradients flow through the JAX-side coefficient recompute (rasterize.py).
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
_BIG_ID = np.float32(2**24)  # ids stored in f32; nf must stay below this
_NEG_INF = np.float32(-3.0e38)


# --------------------------------------------------------------------------
# binning (JAX)
# --------------------------------------------------------------------------


def _tier_slots(tx0, ty0, tx1, ty1, active, ntx, nty, side):
    """Entries for one tier: each active triangle emits side*side tile slots
    covering its bbox-tile range. Returns (tile_ids [n, side*side])."""
    ntiles = ntx * nty
    d = jnp.arange(side, dtype=jnp.int32)
    gx = tx0[:, None] + d[None, :]  # [n, side]
    gy = ty0[:, None] + d[None, :]
    okx = (gx <= tx1[:, None]) & (gx < ntx)
    oky = (gy <= ty1[:, None]) & (gy < nty)
    tile = gy[:, :, None] * ntx + gx[:, None, :]  # [n, side(y), side(x)]
    ok = oky[:, :, None] & okx[:, None, :] & active[:, None, None]
    tile = jnp.where(ok, tile, ntiles)
    return tile.reshape(tile.shape[0], side * side)


def build_bins(v, tri, h: int, w: int, perspective: bool, eps: float,
               med_cap: int = 4096, lg_cap: int = 256, xl_cap: int = 16):
    """-> (dat [B, 16, E] f32, starts [B, ntiles+1] i32, overflow [B, 3])."""
    B = v.shape[0]
    nf = tri.shape[0]
    ntx, nty = w // TILE, h // TILE
    ntiles = ntx * nty
    med_cap = min(med_cap, nf)
    lg_cap = min(lg_cap, nf)
    xl_cap = min(xl_cap, nf)

    def per_batch(vb):
        px, py, z, persp_ok, _x0, _y0, valid, span = _setup(
            vb, tri, h, w, perspective, eps
        )
        # _setup returns only the max-span; recompute both bbox ends here
        umin = jnp.min(px, -1)
        umax = jnp.max(px, -1)
        vmin = jnp.min(py, -1)
        vmax = jnp.max(py, -1)
        x0 = jnp.maximum(jnp.ceil(umin), 0.0).astype(jnp.int32)
        x1 = jnp.minimum(jnp.floor(umax), w - 1.0).astype(jnp.int32)
        y0 = jnp.maximum(jnp.ceil(vmin), 0.0).astype(jnp.int32)
        y1 = jnp.minimum(jnp.floor(vmax), h - 1.0).astype(jnp.int32)

        tx0, tx1 = x0 // TILE, x1 // TILE
        ty0, ty1 = y0 // TILE, y1 // TILE
        tsx = tx1 - tx0 + 1
        tsy = ty1 - ty0 + 1
        ts = jnp.maximum(tsx, tsy)

        tier_a = valid & (ts <= 2)
        tier_m = valid & (ts > 2) & (ts <= 4)
        tier_l = valid & (ts > 4) & (ts <= 16)
        tier_x = valid & (ts > 16)

        ids = jnp.arange(nf, dtype=jnp.int32)
        tiles_a = _tier_slots(tx0, ty0, tx1, ty1, tier_a, ntx, nty, 2)
        ids_a = jnp.broadcast_to(ids[:, None], tiles_a.shape)

        def select(mask, cap):
            prio = jnp.where(mask, span, -1.0)
            _, idx = lax.top_k(prio, cap)
            sel_ok = prio[idx] > 0
            return idx, sel_ok

        m_idx, m_ok = select(tier_m, med_cap)
        tiles_m = _tier_slots(tx0[m_idx], ty0[m_idx], tx1[m_idx], ty1[m_idx],
                              m_ok, ntx, nty, 4)
        ids_m = jnp.broadcast_to(m_idx[:, None], tiles_m.shape)

        l_idx, l_ok = select(tier_l, lg_cap)
        tiles_l = _tier_slots(tx0[l_idx], ty0[l_idx], tx1[l_idx], ty1[l_idx],
                              l_ok, ntx, nty, 16)
        ids_l = jnp.broadcast_to(l_idx[:, None], tiles_l.shape)

        x_idx, x_ok = select(tier_x, xl_cap)
        all_tiles = jnp.arange(ntiles, dtype=jnp.int32)
        tiles_x = jnp.where(x_ok[:, None], all_tiles[None, :], ntiles)
        ids_x = jnp.broadcast_to(x_idx[:, None], tiles_x.shape)

        tile_ids = jnp.concatenate(
            [t.reshape(-1) for t in (tiles_a, tiles_m, tiles_l, tiles_x)]
        )
        tri_ids = jnp.concatenate(
            [t.reshape(-1) for t in (ids_a, ids_m, ids_l, ids_x)]
        )
        # sort by tile; sentinel (ntiles) sinks to the end
        tile_sorted, tri_sorted = lax.sort((tile_ids, tri_ids), num_keys=1)
        starts = jnp.searchsorted(
            tile_sorted, jnp.arange(ntiles + 1, dtype=jnp.int32)
        ).astype(jnp.int32)

        # per-entry data, entries on the lane axis
        dat = jnp.concatenate([px, py, z], axis=-1)  # [nf, 9]
        gathered = dat[tri_sorted]  # [E, 9]
        row_id = tri_sorted.astype(jnp.float32)[:, None]
        full = jnp.concatenate(
            [gathered, row_id,
             jnp.zeros((gathered.shape[0], 6), jnp.float32)], -1
        )  # [E, 16]
        overflow = jnp.stack(
            [
                jnp.maximum(jnp.sum(tier_m.astype(jnp.int32)) - med_cap, 0),
                jnp.maximum(jnp.sum(tier_l.astype(jnp.int32)) - lg_cap, 0),
                jnp.maximum(jnp.sum(tier_x.astype(jnp.int32)) - xl_cap, 0),
            ]
        )
        return full.T, starts, overflow  # [16, E], [ntiles+1], [3]

    dat, starts, overflow = jax.vmap(per_batch)(v)
    # pad E to a CHUNK multiple plus one guard chunk for in-bounds DMA
    E = dat.shape[-1]
    pad = (-E) % CHUNK + CHUNK
    dat = jnp.pad(dat, ((0, 0), (0, 0), (0, pad)))
    return dat, starts, overflow


# --------------------------------------------------------------------------
# kernel
# --------------------------------------------------------------------------


def _kernel_eval(scr, Xf, Yf, h, w, perspective, eps):
    """Candidate evaluation on [64 px, 128 entry] blocks; mirrors
    rasterize._eval_candidate (same branches, same clamps)."""
    px0, px1, px2 = scr[0:1, :], scr[1:2, :], scr[2:3, :]
    py0, py1, py2 = scr[3:4, :], scr[4:5, :], scr[5:6, :]
    z0, z1, z2 = scr[6:7, :], scr[7:8, :], scr[8:9, :]

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
    x1 = jnp.minimum(jnp.floor(umax), w - 1.0)
    y0 = jnp.maximum(jnp.ceil(vmin), 0.0)
    y1 = jnp.minimum(jnp.floor(vmax), h - 1.0)
    bbox_ok = (x1 >= x0) & (y1 >= y0)
    in_bbox = (Xf >= x0) & (Xf <= x1) & (Yf >= y0) & (Yf <= y1)

    r0 = a0 + b0 * Xf + c0 * Yf
    r1 = a1 + b1 * Xf + c1 * Yf
    r2 = a2 + b2 * Xf + c2 * Yf
    raw_ok = (r0 >= -eps) & (r1 >= -eps) & (r2 >= -eps)

    nondeg = det_pos > eps
    s = r0 + r1 + r2
    s_safe = jnp.where(jnp.abs(s) > 1e-30, s, 1.0)
    cn0, cn1, cn2 = r0 / s_safe, r1 / s_safe, r2 / s_safe

    l0 = b0 * b0 + c0 * c0
    l1 = b1 * b1 + c1 * c1
    l2 = b2 * b2 + c2 * c2
    # longest-edge pick with pure boolean masks (no int vectors — Mosaic
    # rejects some int-select lowerings). Reference tie logic:
    # i = (l0 > l1 ? 0 : 1); i = (l[i] > l2 ? i : 2)
    m0 = (l0 > l1) & (l0 > l2)
    m1 = jnp.logical_not(l0 > l1) & (l1 > l2)
    # i=2 otherwise; (i, j, k) cycles: 0->(1,2), 1->(2,0), 2->(0,1)

    def pick(i0, i1, i2):
        return jnp.where(m0, i0, jnp.where(m1, i1, i2))

    b_i = pick(b0, b1, b2)
    c_i = pick(c0, c1, c2)
    l_i = pick(l0, l1, l2)
    px_i = pick(px0, px1, px2)
    py_i = pick(py0, py1, py2)
    px_j = pick(px1, px2, px0)
    py_j = pick(py1, py2, py0)
    px_k = pick(px2, px0, px1)
    py_k = pick(py2, py0, py1)

    seg = l_i > eps
    lj = -(Xf - px_k) * c_i + (Yf - py_k) * b_i
    lk = (Xf - px_j) * c_i - (Yf - py_j) * b_i
    lsum = lj + lk
    lsum_safe = jnp.where(jnp.abs(lsum) > 1e-30, lsum, 1.0)
    cj = lj / lsum_safe
    ck = lk / lsum_safe
    seg_ok = (cj >= -eps) & (ck >= -eps)
    dpt = (Xf - px_i) ** 2 + (Yf - py_i) ** 2
    pt_ok = dpt < eps

    zero = jnp.zeros_like(cj)
    one = jnp.ones_like(cj)
    # coefficient of vertex t: 0 if t==i, cj if t==j, ck if t==k
    seg0 = pick(zero, ck, cj)
    seg1 = pick(cj, zero, ck)
    seg2 = pick(ck, cj, zero)
    pt0 = pick(one, zero, zero)
    pt1 = pick(zero, one, zero)
    pt2 = pick(zero, zero, one)
    d0c = jnp.where(seg, seg0, pt0)
    d1c = jnp.where(seg, seg1, pt1)
    d2c = jnp.where(seg, seg2, pt2)
    # boolean select via algebra — Mosaic rejects select on i1 vectors
    # ("unsupported target bitwidth for truncation")
    deg_ok = (seg & seg_ok) | (jnp.logical_not(seg) & pt_ok)

    co0 = jnp.where(nondeg, cn0, d0c)
    co1 = jnp.where(nondeg, cn1, d1c)
    co2 = jnp.where(nondeg, cn2, d2c)
    cov = front & bbox_ok & in_bbox & raw_ok & (nondeg | deg_ok)

    if perspective:
        # vertices with z >= -eps were pre-culled in _setup (persp_ok); the
        # per-vertex z here is the NDC z (negative in front of the camera)
        z0s = jnp.where(z0 < -eps, z0, -1.0)
        z1s = jnp.where(z1 < -eps, z1, -1.0)
        z2s = jnp.where(z2 < -eps, z2, -1.0)
        q0, q1, q2 = co0 / z0s, co1 / z1s, co2 / z2s
        depth = q0 + q1 + q2
        cov = cov & (depth < -eps)
    else:
        depth = co0 * z0 + co1 * z1 + co2 * z2
    return depth, cov


def _make_kernel(h, w, ntx, perspective, eps):
    def kernel(starts_ref, dat_ref, win_ref, scr_ref, sem):
        b = pl.program_id(0)
        t = pl.program_id(1)
        start = starts_ref[b, t]
        end = starts_ref[b, t + 1]
        n = end - start

        ty = t // ntx
        tx = t % ntx
        pix = jax.lax.broadcasted_iota(jnp.int32, (TILE * TILE, 1), 0)
        Xf = (tx * TILE + pix % TILE).astype(jnp.float32)  # [64, 1]
        Yf = (ty * TILE + pix // TILE).astype(jnp.float32)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)

        # HBM DMA lane offsets must be 128-aligned: stream absolute-aligned
        # chunks covering [start, end) and mask the tails
        c0 = start // CHUNK
        nchunks = (end - c0 * CHUNK + CHUNK - 1) // CHUNK

        def body(c, state):
            zb, wb = state
            off = pl.multiple_of((c0 + c) * CHUNK, CHUNK)
            cp = pltpu.make_async_copy(
                dat_ref.at[b, :, pl.ds(off, CHUNK)], scr_ref, sem
            )
            cp.start()
            cp.wait()
            scr = scr_ref[:]
            depth, cov = _kernel_eval(scr, Xf, Yf, h, w, perspective, eps)
            pos = off + lane
            cov = cov & (pos >= start) & (pos < end)
            ids = scr[9:10, :]
            zm = jnp.where(cov, depth, _NEG_INF)  # [64, 128]
            zc = jnp.max(zm, axis=1, keepdims=True)  # [64, 1]
            idc = jnp.min(
                jnp.where(cov & (zm == zc), ids, _BIG_ID), axis=1, keepdims=True
            )
            better = zc > zb
            equal = zc == zb
            wb = jnp.where(better, idc, jnp.where(equal, jnp.minimum(wb, idc), wb))
            zb = jnp.maximum(zb, zc)
            return zb, wb

        zb0 = jnp.full((TILE * TILE, 1), _NEG_INF, jnp.float32)
        wb0 = jnp.full((TILE * TILE, 1), _BIG_ID, jnp.float32)
        zb, wb = jax.lax.fori_loop(0, nchunks, body, (zb0, wb0))
        win = jnp.where(zb > _NEG_INF, wb, -1.0).astype(jnp.int32)
        win_ref[0, 0, :, :] = win.reshape(TILE, TILE)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("h", "w", "perspective", "eps")
)
def rasterize_winners_pallas(v, tri, h: int, w: int,
                             perspective: bool = False, eps: float = 1e-6):
    """Winner map [B, H, W] int32 (-1 background). Requires h, w % 8 == 0."""
    assert h % TILE == 0 and w % TILE == 0, (h, w)
    v = lax.stop_gradient(v).astype(jnp.float32)
    tri = jnp.asarray(tri, jnp.int32)
    B = v.shape[0]
    ntx, nty = w // TILE, h // TILE
    ntiles = ntx * nty

    dat, starts, _overflow = build_bins(v, tri, h, w, perspective, eps)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, ntiles),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        # TPU blocks need full trailing dims: emit [B, ntiles, 8, 8] and
        # reassemble the image in JAX (a free relayout)
        out_specs=pl.BlockSpec(
            (1, 1, TILE, TILE), lambda b, t, starts: (b, t, 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((16, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    win = pl.pallas_call(
        _make_kernel(h, w, ntx, perspective, eps),
        out_shape=jax.ShapeDtypeStruct((B, ntiles, TILE, TILE), jnp.int32),
        grid_spec=grid_spec,
    )(starts, dat)
    win = win.reshape(B, nty, ntx, TILE, TILE)
    win = win.transpose(0, 1, 3, 2, 4).reshape(B, h, w)
    return win


def bin_overflow(v, tri, h, w, perspective=False, eps=1e-6):
    """Diagnostic: [B, 3] tier overflow counts (must be all zero for exact
    results; raise the caps otherwise)."""
    v = lax.stop_gradient(jnp.asarray(v, jnp.float32))
    _, _, overflow = build_bins(
        v, jnp.asarray(tri, jnp.int32), h, w, perspective, eps
    )
    return overflow
