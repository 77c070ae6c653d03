"""On-chip validation + timing for the batch-fold kernel restructure
(VERDICT r4: kill the per-(batch, tile) grid-step fixed cost).

Runs, in order:
  1. bit-exactness: fused values + winners vs the dense oracle (small B);
  2. kernel timings: winner mode, attr 7-level, all-culled floor;
  3. the model-level split: rasterize_pyramid_fused total, so the glue
     between the raw kernel time and the model's pyramid path is visible.

python benchmarks/probe_bfold.py [iters]
"""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from benchmarks.common import production_face


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
    print(f"{name:44s} {dt * 1e3:8.2f} ms/iter", flush=True)
    return dt


def main(iters=10):
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from stylerenderer_tpu.ops.rasterize import (
        rasterize_pyramid, rasterize_pyramid_fused,
    )
    from stylerenderer_tpu.ops.rasterize_pallas import (
        rasterize_winners_pallas_multi,
    )

    B = 16
    face, tri, vert, norm = production_face(B)
    print(f"B={B} nf={tri.shape[0]}", flush=True)

    # 1. bit-exactness at B=2 (dense oracle is slow)
    v2, n2 = vert[:2], norm[:2]
    sizes = [4] + [2 ** i for i in range(3, 9)]
    fused = rasterize_pyramid_fused(v2, n2, tri, sizes)
    dense = rasterize_pyramid(v2, n2, tri, sizes, method="dense")
    ok = True
    for s, f, d in zip(sizes, fused, dense):
        same = bool(jnp.all(f == d))
        ok &= same
        print(f"  level {s:4d}: values bit-equal={same}", flush=True)
    print(f"values all bit-equal: {ok}", flush=True)

    # 2. kernel timings
    timed(lambda v: sum(jnp.mean(o.astype(jnp.float32)) for o in
                        rasterize_winners_pallas_multi(v, tri, 256, 5)),
          vert, iters, "winner kernel, production mesh")

    culled = vert.at[..., 2].set(vert[..., 2] + 100.0)  # offscreen in z? no-
    # op for ortho; push all verts off the left instead
    culled = vert.at[..., 0].add(-10.0)
    timed(lambda v: sum(jnp.mean(o.astype(jnp.float32)) for o in
                        rasterize_winners_pallas_multi(v, tri, 256, 5)),
          culled, iters, "winner kernel, ALL-CULLED (floor)")

    def attr_mode7(v):
        outs = rasterize_winners_pallas_multi(v, tri, 256, 7, attrs=norm)
        return sum(jnp.mean(va) for va, _ in outs)

    timed(attr_mode7, vert, iters, "7-level attr (bins+kernel+tail)")

    timed(lambda v: sum(jnp.mean(o.astype(jnp.float32)) for o in
                        rasterize_pyramid_fused(v, norm, tri, sizes)),
          vert, iters, "rasterize_pyramid_fused (model glue)")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 10)
