"""Normal-map pyramid winner search: per-level Pallas calls vs the one-pass
multi-level kernel (what GeneratorWithMap's pyramid_mode='each' uses).

Timing: iterations inside one jitted lax.scan over per-iter perturbed
vertices (loop-variant so XLA can't hoist), host-readback barrier.

python benchmarks/bench_pyramid.py [top] [batch]
"""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import time

import numpy as np
import jax
import jax.numpy as jnp

from benchmarks.common import production_face


def timed_scan(fn, verts, iters=10):
    """fn(v)->scalar; scans over ``iters`` perturbed vertex sets in one jit."""

    @jax.jit
    def many(v, deltas):
        def body(acc, d):
            return acc + fn(v + d), None

        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), deltas)
        return acc

    deltas = (
        jax.random.normal(jax.random.PRNGKey(9), (iters, 1, 1, 3)) * 1e-4
    )
    float(np.asarray(many(v=verts, deltas=deltas)))  # compile + warm
    t0 = time.perf_counter()
    float(np.asarray(many(v=verts, deltas=deltas)))  # readback = barrier
    return (time.perf_counter() - t0) / iters


def main(top: int = 256, B: int = 16):
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from stylerenderer_tpu.ops.rasterize_pallas import (
        rasterize_winners_pallas, rasterize_winners_pallas_multi,
    )

    face, tri, vert, norm = production_face(B)
    print(f"mesh: {tri.shape[0]} tris, batch {B}, top {top}")
    tile = 16 if top <= 256 else 32
    # the kernel covers levels down to 1 px/tile; stop at 16px (below that
    # the auto dispatch uses the dense search anyway)
    n_levels = min(int(np.log2(tile)) + 1, int(np.log2(top // 16)) + 1)
    levels = [top >> k for k in range(n_levels)]
    print(f"levels: {levels}")

    def per_level(v):
        acc = jnp.zeros((), jnp.float32)
        for s in levels:
            acc += jnp.sum(
                rasterize_winners_pallas(v, tri, s, s).astype(jnp.float32)
            )
        return acc

    def multi(v):
        outs = rasterize_winners_pallas_multi(v, tri, top, n_levels)
        return sum(jnp.sum(o.astype(jnp.float32)) for o in outs)

    dt_m = timed_scan(multi, vert)
    print(f"multi one-pass : {dt_m * 1e3:7.2f} ms/pyramid ({B / dt_m:6.0f} pyramids/s)")
    dt_p = timed_scan(per_level, vert)
    print(f"per-level x{len(levels)}: {dt_p * 1e3:7.2f} ms/pyramid ({B / dt_p:6.0f} pyramids/s)")
    print(f"speedup: {dt_p / dt_m:.2f}x")


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:3]))
