"""Isolate the multi kernel's per-RANGE fixed overhead: run the production
launch shape with a mesh that is entirely culled (every vertex behind the
camera -> zero valid triangles), so every one of the ~1792 ranges/img is
empty (nchunks=0) and the measured time is pipeline + range-setup only.
Compare against the tiny-mesh and production runs to split
(range setup) vs (chunk evals).

python benchmarks/probe_ranges.py [batch] [iters]
"""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def timed(fn, xs, iters, name):
    @jax.jit
    def many(v, deltas):
        def body(acc, d):
            return acc + fn(v + d), None

        acc, _ = lax.scan(body, jnp.zeros((), jnp.float32), deltas)
        return acc

    deltas = jax.random.normal(jax.random.PRNGKey(9), (iters, 1, 1, 3)) * 1e-5
    float(np.asarray(many(xs, deltas)))
    t0 = time.perf_counter()
    float(np.asarray(many(xs, deltas)))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:52s} {dt * 1e3:8.2f} ms/iter", flush=True)
    return dt


def main(B=16, iters=10):
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from stylerenderer_tpu.face3d import mesh_point_normal, synthetic_face
    from stylerenderer_tpu.ops.rasterize_pallas import (
        build_bins_multi, rasterize_winners_pallas_multi,
    )

    face, tri = synthetic_face(180, 280, 8, 4)
    x = face.random_input(jax.random.PRNGKey(0), B)
    vert = face(x)
    norm = mesh_point_normal(vert, tri)
    nf = tri.shape[0]
    print(f"nf={nf} B={B}", flush=True)

    # winner mode, production mesh (reference point)
    def winner5(v):
        outs = rasterize_winners_pallas_multi(v, tri, 256, 5)
        return sum(jnp.sum(o) for o in outs).astype(jnp.float32)

    timed(winner5, vert, iters, "winner kernel, production mesh")

    # all-culled mesh: translate fully off-screen -> every triangle invalid
    # (bbox misses the image at every level), every range empty -> what
    # remains is pipeline + per-range setup overhead
    vcull = vert + jnp.asarray([100.0, 0.0, 0.0])
    timed(winner5, vcull, iters, "winner kernel, ALL-CULLED mesh (pure ranges)")

    # binning alone for both (to subtract)
    def bins_only(v):
        dat, starts = build_bins_multi(v, tri, 256, 5, False, 1e-6, 16)
        return jnp.sum(dat[:, 0, :1]) + jnp.sum(
            starts[:, :1].astype(jnp.float32))

    timed(bins_only, vert, iters, "binning only (winner mode, production)")
    timed(bins_only, vcull, iters, "binning only (winner mode, culled)")

    # attr-mode binning (the 20-operand sort) for the width split
    def bins_attr(v):
        dat, starts = build_bins_multi(v, tri, 256, 5, False, 1e-6, 16,
                                       attrs=norm)
        return jnp.sum(dat[:, 0, :1]) + jnp.sum(
            starts[:, :1].astype(jnp.float32))

    timed(bins_attr, vert, iters, "binning only (attr mode, production)")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 16,
         int(sys.argv[2]) if len(sys.argv) > 2 else 10)
