"""Rasterizer winner-search throughput across methods and resolutions.

python benchmarks/bench_rasterizer.py
"""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from benchmarks.common import production_face, timed


def main():
    from stylerenderer_tpu.ops.rasterize_pallas import (
        build_bins, rasterize_winners_pallas,
    )

    B = 8
    face, tri, vert, norm = production_face(B)
    print(f"mesh: {tri.shape[0]} tris, batch {B}")

    f = jax.jit(lambda v: build_bins(v, tri, 256, 256, False, 1e-6)[1].sum())
    print(f"binning 256:    {timed(f, vert) * 1e3:7.1f} ms")
    for res in (64, 128, 256, 512):
        f = jax.jit(lambda v, r=res: rasterize_winners_pallas(v, tri, r, r))
        dt = timed(f, vert)
        print(f"winners {res}px:  {dt * 1e3:7.1f} ms  ({B / dt:6.0f} img/s)")


if __name__ == "__main__":
    main()
