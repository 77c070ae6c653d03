"""One-off: does tile=16 at 256px beat tile=8 (4x fewer pallas programs,
same eval work)?

python benchmarks/profile_tile16.py
"""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from benchmarks.common import production_face, timed


def main():
    import stylerenderer_tpu.ops.rasterize_pallas as rp
    from stylerenderer_tpu.ops.rasterize import rasterize

    B, h, w = 8, 256, 256
    face, tri, vert, norm = production_face(B)

    for tile in (8, 16, 32):
        rp._tile_for = lambda h_, w_, t=tile: t

        @jax.jit
        def winners(v):
            return rp.rasterize_winners_pallas(v, tri, h, w).sum()

        @jax.jit
        def e2e(v, tex):
            return rasterize(v, tex, tri, h, w, method="pallas").sum()

        print(f"tile={tile:2d} winners: {timed(winners, vert)*1e3:7.1f} ms"
              f"   e2e: {timed(e2e, vert, norm)*1e3:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
