"""A/B the multi-level binning sort strategies on the real chip.

Variants (all produce the same (dat, starts) contract as build_bins_multi):
  a) current: one 11-operand lax.sort (key + 9 coord rows + id)
  b) packed:  pack (key, id) into ONE int32 (key*2^17 | id), sort ONE
     operand, then ONE contiguous row-gather of the [nf, 9] coord table
     with the sorted ids (same trick as rasterize._triangle_table)
  c) two-op:  sort (key, id) then row-gather (the variant the build_bins
     comment says lost to (a) by ~1.6x — re-measured here for the record)

python benchmarks/profile_sort.py [batch] [iters]
"""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from benchmarks.common import production_face

from stylerenderer_tpu.ops.rasterize_binned import _setup
from stylerenderer_tpu.ops.rasterize_pallas import (
    MULTI_N_TIERS, build_bins_multi,
)


def _keys_multi(vb, tri, top, n_levels, perspective, eps, tile):
    """The key computation of build_bins_multi (shared by all variants)."""
    ntx = top // tile
    ntiles = ntx * ntx
    kmax = n_levels - 1
    det_scale = float(4 ** kmax)
    px, py, z, persp_ok, _x0, _y0, _valid, _span = _setup(
        vb, tri, top, top, perspective, eps
    )
    umin = jnp.min(px, -1)
    umax = jnp.max(px, -1)
    vmin = jnp.min(py, -1)
    vmax = jnp.max(py, -1)
    bbox_any = jnp.zeros(umin.shape, bool)
    for k in range(n_levels):
        inv = 1.0 / (1 << k)
        wl = top >> k
        u0 = (umin + 0.5) * inv - 0.5
        u1 = (umax + 0.5) * inv - 0.5
        v0 = (vmin + 0.5) * inv - 0.5
        v1 = (vmax + 0.5) * inv - 0.5
        ok = ((jnp.minimum(jnp.floor(u1), wl - 1.0)
               >= jnp.maximum(jnp.ceil(u0), 0.0))
              & (jnp.minimum(jnp.floor(v1), wl - 1.0)
                 >= jnp.maximum(jnp.ceil(v0), 0.0)))
        bbox_any = bbox_any | ok
    nv = vb.shape[0]
    idx_ok = jnp.all((tri >= 0) & (tri < nv), axis=-1)
    px0, px1_, px2 = px[:, 0], px[:, 1], px[:, 2]
    py0_, py1_, py2_ = py[:, 0], py[:, 1], py[:, 2]
    a0 = px1_ * py2_ - py1_ * px2
    a1 = py0_ * px2 - px0 * py2_
    a2 = px0 * py1_ - py0_ * px1_
    det = a0 + a1 + a2
    front_any = det <= eps * det_scale
    valid = idx_ok & persp_ok & bbox_any & front_any
    x0 = jnp.maximum(jnp.floor(umin), 0.0).astype(jnp.int32)
    x1 = jnp.minimum(jnp.floor(umax), top - 1.0).astype(jnp.int32)
    y0 = jnp.maximum(jnp.floor(vmin), 0.0).astype(jnp.int32)
    y1 = jnp.minimum(jnp.floor(vmax), top - 1.0).astype(jnp.int32)
    x1 = jnp.maximum(x1, x0)
    y1 = jnp.maximum(y1, y0)
    tx0, tx1 = x0 // tile, x1 // tile
    ty0, ty1 = y0 // tile, y1 // tile
    ts = jnp.maximum(tx1 - tx0, ty1 - ty0) + 1
    xl = MULTI_N_TIERS - 1
    sgn = jnp.where(det < 0, -1.0, 1.0)
    deg = det * sgn <= eps * det_scale
    tier = jnp.where(ts <= 1, 0, jnp.where(ts <= 2, 1, xl))
    tier_deg = jnp.where(ts <= 1, 2, jnp.where(ts <= 2, 3, xl))
    tier = jnp.where(deg, tier_deg, tier)
    home = ty0 * ntx + tx0
    key = jnp.where(valid, tier * ntiles + home, MULTI_N_TIERS * ntiles)
    return key.astype(jnp.int32), px, py, z, ntiles


def bins_packed(v, tri, top, n_levels, perspective, eps, tile):
    """Variant (b): one packed int32 sort + one contiguous row gather."""
    nf = tri.shape[0]
    assert nf < (1 << 17)

    def per_batch(vb):
        key, px, py, z, ntiles = _keys_multi(
            vb, tri, top, n_levels, perspective, eps, tile
        )
        ids = jnp.arange(nf, dtype=jnp.int32)
        packed = key * (1 << 17) + ids
        packed = lax.sort(packed)
        key_sorted = packed // (1 << 17)
        ids_sorted = packed & ((1 << 17) - 1)
        starts = jnp.searchsorted(
            key_sorted,
            jnp.arange(MULTI_N_TIERS * ntiles + 1, dtype=jnp.int32),
        ).astype(jnp.int32)
        # contiguous [nf, 10] row table, gathered once by sorted id
        table = jnp.concatenate(
            [px, py, z, ids.astype(jnp.float32)[:, None]], axis=1
        )  # [nf, 10]
        rows = jnp.take(table, ids_sorted, axis=0)  # [nf, 10]
        full = jnp.concatenate(
            [rows.T, jnp.zeros((6, nf), jnp.float32)], axis=0
        )  # [16, nf]
        return full, starts

    dat, starts = jax.vmap(per_batch)(v)
    pad = (-nf) % 128 + 128
    dat = jnp.pad(dat, ((0, 0), (0, 0), (0, pad)))
    return dat, starts


def bins_twoop(v, tri, top, n_levels, perspective, eps, tile):
    """Variant (c): (key, id) sort + row gather."""
    nf = tri.shape[0]

    def per_batch(vb):
        key, px, py, z, ntiles = _keys_multi(
            vb, tri, top, n_levels, perspective, eps, tile
        )
        ids = jnp.arange(nf, dtype=jnp.int32)
        key_sorted, ids_sorted = lax.sort((key, ids), num_keys=1)
        starts = jnp.searchsorted(
            key_sorted,
            jnp.arange(MULTI_N_TIERS * ntiles + 1, dtype=jnp.int32),
        ).astype(jnp.int32)
        table = jnp.concatenate(
            [px, py, z, ids.astype(jnp.float32)[:, None]], axis=1
        )
        rows = jnp.take(table, ids_sorted, axis=0)
        full = jnp.concatenate(
            [rows.T, jnp.zeros((6, nf), jnp.float32)], axis=0
        )
        return full, starts

    dat, starts = jax.vmap(per_batch)(v)
    pad = (-nf) % 128 + 128
    dat = jnp.pad(dat, ((0, 0), (0, 0), (0, pad)))
    return dat, starts


def timed(fn, v, iters, name):
    @jax.jit
    def many(v, deltas):
        def body(acc, d):
            dat, starts = fn(v + d)
            return acc + jnp.sum(dat[:, 0, ::1024]) + starts[0, -1], None

        acc, _ = lax.scan(body, jnp.zeros((), jnp.float32), deltas)
        return acc

    deltas = jax.random.normal(jax.random.PRNGKey(9), (iters, 1, 1, 3)) * 1e-5
    float(np.asarray(many(v, deltas)))
    t0 = time.perf_counter()
    float(np.asarray(many(v, deltas)))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:34s} {dt * 1e3:8.2f} ms/iter")
    return dt


def main(B=16, iters=10):
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    top, n_levels, tile = 256, 5, 16
    face, tri, vert, norm = production_face(B)
    print(f"B={B} nf={tri.shape[0]} top={top} levels={n_levels}")

    # correctness: identical starts + identical candidate data in each bin
    da, sa = jax.jit(lambda v: build_bins_multi(
        v, tri, top, n_levels, False, 1e-6, tile))(vert)
    db, sb = jax.jit(lambda v: bins_packed(
        v, tri, top, n_levels, False, 1e-6, tile))(vert)
    np.testing.assert_array_equal(np.asarray(sa), np.asarray(sb))
    np.testing.assert_allclose(np.asarray(da[:, :10, :db.shape[2]]),
                               np.asarray(db[:, :10]), rtol=0, atol=0)
    print("packed variant bit-identical")

    timed(lambda v: build_bins_multi(v, tri, top, n_levels, False, 1e-6,
                                     tile), vert, iters, "11-operand sort (current)")
    timed(lambda v: bins_packed(v, tri, top, n_levels, False, 1e-6, tile),
          vert, iters, "packed 1-op sort + row gather")
    timed(lambda v: bins_twoop(v, tri, top, n_levels, False, 1e-6, tile),
          vert, iters, "2-op sort + row gather")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 16,
         int(sys.argv[2]) if len(sys.argv) > 2 else 10)
