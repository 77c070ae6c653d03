"""Fixed-overhead probe for the multi-level kernel: run the same grid
(B x 256 tiles) with a TINY mesh (~1k triangles) so nearly all segments are
empty — what remains is per-program + per-range + per-empty-chunk overhead.
Compare against the production mesh to split fixed vs per-triangle cost.

python benchmarks/profile_overhead.py [batch] [iters]
"""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from benchmarks.common import production_face


def timed(make_fn, v, norm, iters, label):
    @jax.jit
    def many(v, deltas):
        def body(acc, d):
            return acc + make_fn(v + d), None

        acc, _ = lax.scan(body, jnp.zeros((), jnp.float32), deltas)
        return acc

    deltas = jax.random.normal(jax.random.PRNGKey(9), (iters, 1, 1, 3)) * 1e-5
    float(np.asarray(many(v, deltas)))
    t0 = time.perf_counter()
    float(np.asarray(many(v, deltas)))
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:46s} {dt * 1e3:8.2f} ms/iter", flush=True)


def main(B=16, iters=10):
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from stylerenderer_tpu.face3d import mesh_point_normal, synthetic_face
    from stylerenderer_tpu.ops.rasterize_pallas import (
        build_bins_multi, rasterize_winners_pallas_multi,
    )

    for label, (nu, nv) in (("tiny (~1.3k tris)", (16, 42)),
                            ("mid (~12k tris)", (60, 100)),
                            ("production (~100k tris)", (180, 280))):
        face, tri = synthetic_face(nu, nv, 8, 4)
        x = face.random_input(jax.random.PRNGKey(0), B)
        vert = face(x)
        norm = mesh_point_normal(vert, tri)
        print(f"{label}: nf={tri.shape[0]}", flush=True)

        def full(v, norm=norm, tri=tri):
            outs = rasterize_winners_pallas_multi(
                v, tri, 256, 5, attrs=norm)
            return sum(jnp.sum(va[..., 0]) for va, _ in outs)

        def bins_only(v, norm=norm, tri=tri):
            dat, starts = build_bins_multi(v, tri, 256, 5, False, 1e-6, 16,
                                           attrs=norm)
            return jnp.sum(dat[:, 0, :1]) + jnp.sum(starts[:, :1].astype(
                jnp.float32))

        timed(full, vert, norm, iters, f"  attr pipeline (bins+kernel+rec)")
        timed(bins_only, vert, norm, iters, f"  binning only")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 16,
         int(sys.argv[2]) if len(sys.argv) > 2 else 10)
