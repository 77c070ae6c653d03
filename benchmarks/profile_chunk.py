"""Chunk-size sweep for the multi-level z-scan kernel: if the scan is bound
by per-chunk fixed overhead (DMA wait + loop/branch latency over ~36k chunk
iterations per pyramid) rather than VPU math, bigger chunks win.

python benchmarks/profile_chunk.py [batch] [iters]
"""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from benchmarks.common import production_face


def main(B=16, iters=10):
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from stylerenderer_tpu.ops.rasterize_pallas import (
        rasterize_winners_pallas_multi,
    )

    face, tri, vert, norm = production_face(B)
    print(f"B={B} nf={tri.shape[0]}", flush=True)
    deltas = jax.random.normal(jax.random.PRNGKey(9), (iters, 1, 1, 3)) * 1e-5

    for chunk in (128, 256, 512):
        @jax.jit
        def many(v, deltas, chunk=chunk):
            def body(acc, d):
                outs = rasterize_winners_pallas_multi(
                    v + d, tri, 256, 5, attrs=norm, main_chunk=chunk,
                )
                return acc + sum(jnp.sum(va[..., 0]) for va, _ in outs), None

            acc, _ = lax.scan(body, jnp.zeros((), jnp.float32), deltas)
            return acc

        float(np.asarray(many(vert, deltas)))
        t0 = time.perf_counter()
        float(np.asarray(many(vert, deltas)))
        dt = (time.perf_counter() - t0) / iters
        print(f"attr kernel (levels 256..16), chunk={chunk:4d}: "
              f"{dt * 1e3:8.2f} ms/iter", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 16,
         int(sys.argv[2]) if len(sys.argv) > 2 else 10)
