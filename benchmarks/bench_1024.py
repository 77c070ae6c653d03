"""1024px GAR forward smoke + 512px rasterize line (VERDICT r1 #8): the
reference's channel table tops out at 1024 (model.py:96-105) — exercise the
big-image Pallas tiers (tile 16/32) and the remat'd generator on chip.

python benchmarks/bench_1024.py
"""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import time

import numpy as np
import jax
import jax.numpy as jnp

from benchmarks.common import production_face


def readback(x):
    return float(np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[0])


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from stylerenderer_tpu.models import GeneratorWithMap
    from stylerenderer_tpu.ops.rasterize_pallas import rasterize_winners_pallas

    B = 4
    face, tri, vert, norm = production_face(B)

    # --- 512px / 1024px rasterize winner-search lines (tile 16 / 32) ---
    for res, iters in ((512, 8), (1024, 4)):
        deltas = jax.random.normal(
            jax.random.PRNGKey(1), (iters, 1, 1, 3)) * 1e-4

        @jax.jit
        def many(v, ds, r=res):
            def body(acc, d):
                w = rasterize_winners_pallas(v + d, tri, r, r)
                return acc + jnp.sum(w.astype(jnp.float32)), None
            return jax.lax.scan(body, jnp.zeros((), jnp.float32), ds)[0]

        readback(many(vert, deltas))
        t0 = time.perf_counter()
        readback(many(vert, deltas))
        dt = (time.perf_counter() - t0) / iters
        print(f"rasterize {res}px winners: {dt * 1e3:7.1f} ms/batch{B} "
              f"({B / dt:5.0f} img/s)")

    # --- 1024px remat'd GAR forward smoke (memory-bound tier) ---
    size, latent, b1k = 1024, 512, 1
    gen = GeneratorWithMap(size, latent, 8, dtype=jnp.bfloat16,
                           pyramid_mode="downsample", remat=True)
    z = jax.random.normal(jax.random.PRNGKey(2), (b1k, latent))
    # jit the init: eager execution costs ~15-20 ms/dispatch on this backend,
    # so an un-jitted 1024px init alone would run tens of minutes
    variables = jax.jit(gen.init)(
        {"params": jax.random.PRNGKey(3), "noise": jax.random.PRNGKey(4)},
        [z], (vert[:b1k], norm[:b1k], tri),
    )

    @jax.jit
    def fwd(p, z):
        img, _, _ = gen.apply({"params": p}, [z], (vert[:b1k], norm[:b1k], tri),
                              rngs={"noise": jax.random.PRNGKey(5)})
        return jnp.mean(img.astype(jnp.float32))

    readback(fwd(variables["params"], z))
    t0 = time.perf_counter()
    readback(fwd(variables["params"], z))
    dt = time.perf_counter() - t0
    print(f"GAR 1024px remat fwd: {dt * 1e3:7.1f} ms/img (batch {b1k}, "
          f"single dispatch incl. ~15-20 ms round-trip)")


if __name__ == "__main__":
    main()
