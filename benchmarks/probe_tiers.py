"""Tier/segment population census for the multi-level kernel's binning:
how many triangles land in each tier, how many chunks each tile actually
scans (incl. 128-alignment boundary waste and the per-tile XL scan), for
the tiny / mid / production meshes. Pure JAX on CPU — no chip needed.

python benchmarks/probe_tiers.py [batch]
"""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import jax


def main(B=16):
    jax.config.update("jax_platforms", "cpu")
    from stylerenderer_tpu.face3d import mesh_point_normal, synthetic_face
    from stylerenderer_tpu.ops.rasterize_pallas import (
        CHUNK, MULTI_N_TIERS, MULTI_TIERS, build_bins_multi,
    )

    top, tile, n_levels = 256, 16, 5
    ntx = top // tile
    ntiles = ntx * ntx

    for label, (nu, nv) in (("tiny", (16, 42)), ("mid", (60, 100)),
                            ("production", (180, 280))):
        face, tri = synthetic_face(nu, nv, 8, 4)
        x = face.random_input(jax.random.PRNGKey(0), B)
        vert = face(x)
        norm = mesh_point_normal(vert, tri)
        dat, starts = build_bins_multi(vert, tri, top, n_levels, False,
                                       1e-6, tile, attrs=norm)
        starts = np.asarray(starts)  # [B, n_tiers*ntiles + 1]
        nf = tri.shape[0]
        print(f"== {label}: nf={nf}  (B={B}, {ntiles} tiles)")
        tot_chunks = np.zeros(B)
        for tier, span, full in MULTI_TIERS:
            base = tier * ntiles
            pop = starts[:, base + ntiles] - starts[:, base]
            # per-tile chunk count incl. alignment waste, summed over tiles
            chunks = np.zeros(B)
            for t in range(ntiles):
                ty, tx = divmod(t, ntx)
                for dy in range(span):
                    row = ty - dy
                    if row < 0:
                        continue
                    lo_col = max(tx - (span - 1), 0)
                    lo = starts[:, base + row * ntx + lo_col]
                    hi = starts[:, base + row * ntx + tx + 1]
                    c0 = lo // CHUNK
                    n = np.where(hi > lo, (hi - c0 * CHUNK + CHUNK - 1) // CHUNK, 0)
                    chunks += n
            tot_chunks += chunks
            print(f"  tier{tier} span{span} full={full}: pop={pop.mean():9.1f}"
                  f"  chunk-evals/batch={chunks.mean():9.1f}")
        xl_lo = starts[:, (MULTI_N_TIERS - 1) * ntiles]
        xl_hi = starts[:, MULTI_N_TIERS * ntiles]
        xl_pop = xl_hi - xl_lo
        c0 = xl_lo // CHUNK
        xl_chunks = np.where(xl_hi > xl_lo,
                             (xl_hi - c0 * CHUNK + CHUNK - 1) // CHUNK, 0)
        print(f"  XL: pop={xl_pop.mean():9.1f}  chunks={xl_chunks.mean():6.1f}"
              f"  x {ntiles} tiles = {xl_chunks.mean() * ntiles:9.1f} scans/batch")
        ideal = -(-nf // CHUNK)
        print(f"  non-XL chunk-evals/batch {tot_chunks.mean():9.1f}"
              f"  (zero-waste partition of all tris = {ideal})")
        print(f"  TOTAL per-batch chunk work incl XL-scans:"
              f" {(tot_chunks + xl_chunks * ntiles).mean():9.1f}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 16)
