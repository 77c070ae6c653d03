"""One-off: fine-grained timing of the pallas rasterizer pipeline stages.

python benchmarks/profile_raster.py
"""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax import lax

from benchmarks.common import production_face, timed


def main():
    import stylerenderer_tpu.ops.rasterize_pallas as rp
    from stylerenderer_tpu.ops.rasterize_binned import _setup
    from stylerenderer_tpu.ops.rasterize import winner_coeff

    B = 8
    h = w = 256
    face, tri, vert, norm = production_face(B)
    nf = tri.shape[0]
    ntx = nty = h // rp.TILE
    ntiles = ntx * nty
    print(f"mesh: {nf} tris, batch {B}, {h}px")

    # stage 1: per-triangle setup only
    def setup_only(v):
        def pb(vb):
            px, py, z, *_ = _setup(vb, tri, h, w, False, 1e-6)
            return px.sum() + py.sum() + z.sum()
        return jax.vmap(pb)(v).sum()

    print(f"setup:          {timed(jax.jit(setup_only), vert)*1e3:7.1f} ms")

    # stage 2: setup + key sort (2-operand)
    def setup_sort(v):
        def pb(vb):
            px, py, z, persp_ok, _x0, _y0, valid, span = _setup(
                vb, tri, h, w, False, 1e-6)
            key = jnp.where(valid, jnp.zeros((), jnp.int32), 5 * ntiles)
            ids = jnp.arange(nf, dtype=jnp.int32)
            ks, iss = lax.sort((key, ids), num_keys=1)
            return ks.sum() + iss.sum()
        return jax.vmap(pb)(v).sum()

    print(f"setup+sort2:    {timed(jax.jit(setup_sort), vert)*1e3:7.1f} ms")

    # stage 2b: setup + packed single-operand sort
    def setup_sort1(v):
        def pb(vb):
            px, py, z, persp_ok, _x0, _y0, valid, span = _setup(
                vb, tri, h, w, False, 1e-6)
            ids = jnp.arange(nf, dtype=jnp.int32)
            key = jnp.where(valid, 0, 5 * ntiles)
            packed = key * (1 << 17) + ids
            ks = lax.sort(packed)
            return ks.sum()
        return jax.vmap(pb)(v).sum()

    print(f"setup+sort1:    {timed(jax.jit(setup_sort1), vert)*1e3:7.1f} ms")

    # stage 3: full build_bins (incl. gather + pad + transpose)
    def bins_full(v):
        dat, starts = rp.build_bins(v, tri, h, w, False, 1e-6)
        return dat.sum() + starts.sum()

    print(f"build_bins all: {timed(jax.jit(bins_full), vert)*1e3:7.1f} ms")

    # stage 4: kernel only, bins precomputed
    dat, starts = jax.jit(
        lambda v: rp.build_bins(v, tri, h, w, False, 1e-6))(vert)
    dat = jax.block_until_ready(dat)

    kern = rp._make_kernel(h, w, ntx, nty, False, 1e-6)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, ntiles),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((1, 1, rp.TILE, rp.TILE),
                               lambda b, t, starts: (b, t, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, 16, rp.CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    @jax.jit
    def kernel_only(starts, dat):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((B, ntiles, rp.TILE, rp.TILE),
                                           jnp.int32),
            grid_spec=grid_spec,
        )(starts, dat).sum()

    print(f"kernel only:    {timed(kernel_only, starts, dat)*1e3:7.1f} ms")

    # stage 5: winner_coeff interp (what rasterize() adds on top of winners)
    win = jax.jit(lambda v: rp.rasterize_winners_pallas(v, tri, h, w))(vert)
    win = jax.block_until_ready(win)

    @jax.jit
    def interp(v, win, tex):
        coeff, vidx = winner_coeff(v, tri, win, h, w)
        B_ = v.shape[0]
        gathered = tex[jnp.arange(B_)[:, None, None, None], vidx]
        return jnp.sum(gathered * coeff[..., None], axis=-2).sum()

    print(f"winner_coeff:   {timed(interp, vert, win, norm)*1e3:7.1f} ms")

    # winner_coeff sub-stages
    @jax.jit
    def coeff_only(v, win):
        coeff, vidx = winner_coeff(v, tri, win, h, w)
        return coeff.sum() + vidx.sum()

    print(f"  coeff only:   {timed(coeff_only, vert, win)*1e3:7.1f} ms")

    @jax.jit
    def gathers_only(v, win, tex):
        valid = win >= 0
        win_safe = jnp.clip(win, 0, tri.shape[0] - 1)
        vidx = tri.astype(jnp.int32)[win_safe]
        B_ = v.shape[0]
        pts = v[jnp.arange(B_)[:, None, None, None], vidx]
        gtex = tex[jnp.arange(B_)[:, None, None, None], vidx]
        return pts.sum() + gtex.sum() + valid.sum()

    print(f"  gathers only: {timed(gathers_only, vert, win, norm)*1e3:7.1f} ms")

    # full rasterize() end-to-end (bins + kernel + fused interp)
    from stylerenderer_tpu.ops.rasterize import rasterize

    @jax.jit
    def full(v, tex):
        return rasterize(v, tex, tri, h, w, method="pallas").sum()

    print(f"rasterize e2e:  {timed(full, vert, norm)*1e3:7.1f} ms")


if __name__ == "__main__":
    main()
