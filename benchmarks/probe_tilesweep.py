"""Sweep the multi kernel's tile edge / DMA chunk at top=256 (VERDICT r3 #1:
kill the grid-quantization floor). tile=32 runs 4x fewer grid steps and 4x
fewer range setups than tile=16 for the SAME total lane work — the floor is
range setup (~0.5-1 us each, benchmarks/probe_ranges.py), not chunk evals.

python benchmarks/probe_tilesweep.py [batch] [iters] [tile chunk ...]
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


def main(B=16, iters=10, configs=((16, 128), (32, 128), (32, 256))):
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from stylerenderer_tpu.ops.rasterize_pallas import (
        rasterize_winners_pallas_multi,
    )

    face, tri, vert, norm = production_face(B)
    print(f"B={B} nf={tri.shape[0]}", flush=True)

    for tile, chunk in configs:
        def attr7(v, tile=tile, chunk=chunk):
            outs = rasterize_winners_pallas_multi(
                v, tri, 256, 7, attrs=norm, tile=tile, main_chunk=chunk)
            return sum(jnp.mean(va) for va, _ in outs)

        timed(attr7, vert, iters, f"7-level attr tile={tile} chunk={chunk}")


if __name__ == "__main__":
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    rest = [int(a) for a in sys.argv[3:]]
    if rest:
        configs = tuple(zip(rest[0::2], rest[1::2]))
        main(B, iters, configs)
    else:
        main(B, iters)
