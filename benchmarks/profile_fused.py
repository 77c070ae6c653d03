"""Decompose the fused-pyramid forward: kernel (attr vs winner mode),
values-recompute, dense 4/8 tail, reassembly — each timed in isolation with
the loop-variant scan + host-readback methodology.

python benchmarks/profile_fused.py [batch] [iters]
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
    print(f"{name:36s} {dt * 1e3:8.2f} ms/iter", flush=True)
    return dt


def main(B=16, iters=10):
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from stylerenderer_tpu.ops.rasterize import (
        _dispatch_winners, _interp_from_win, rasterize_pyramid_fused,
    )
    from stylerenderer_tpu.ops.rasterize_pallas import (
        build_bins_multi, rasterize_winners_pallas_multi,
    )

    face, tri, vert, norm = production_face(B)
    print(f"B={B} nf={tri.shape[0]}", flush=True)

    # (a) multi kernel, winner mode (bins + kernel)
    timed(lambda v: sum(jnp.mean(o.astype(jnp.float32)) for o in
                        rasterize_winners_pallas_multi(v, tri, 256, 5)),
          vert, iters, "bins + kernel (winner mode)")

    # (b) multi kernel, attr mode (bins + kernel + values recompute)
    def attr_mode(v):
        outs = rasterize_winners_pallas_multi(v, tri, 256, 5, attrs=norm)
        return sum(jnp.mean(va) for va, _ in outs)

    timed(attr_mode, vert, iters, "bins + kernel + recompute (attr)")

    # (c) binning WITH attrs (the attr-mode extra gather/stack)
    def bins_attr(v):
        dat, starts = build_bins_multi(v, tri, 256, 5, False, 1e-6, 16,
                                       attrs=norm)
        return jnp.mean(dat[:, 9, :]) + jnp.mean(starts.astype(jnp.float32))

    timed(bins_attr, vert, iters, "binning only (with attrs)")

    # (d) values recompute was removed: interpolation now happens in-kernel
    # with the coefficients the depth computation already produces

    # (e) dense 4+8 winners + interp (the pyramid tail below the multi kernel)
    def tail48(v):
        acc = jnp.zeros((), jnp.float32)
        for s in (4, 8):
            win = _dispatch_winners(v, tri, s, s, False, 1e-6, "auto")
            out = _interp_from_win(v, norm, tri, win, s, s, False, 1e-6)
            acc += jnp.mean(out.astype(jnp.float32))
        return acc

    timed(tail48, vert, iters, "dense 4+8 winners + interp")

    # (f) 7-level multi kernel (5 tiled + 2-level single-tile tail)
    def attr_mode7(v):
        outs = rasterize_winners_pallas_multi(v, tri, 256, 7, attrs=norm)
        return sum(jnp.mean(va) for va, _ in outs)

    timed(attr_mode7, vert, iters, "bins + kernel + TAIL (7 levels)")

    # (g) whole fused pyramid (the model's 'each' path)
    sizes = [4] + [2 ** i for i in range(3, 9)]
    timed(lambda v: sum(jnp.mean(o.astype(jnp.float32)) for o in
                        rasterize_pyramid_fused(v, norm, tri, sizes)),
          vert, iters, "rasterize_pyramid_fused (all)")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 16,
         int(sys.argv[2]) if len(sys.argv) > 2 else 10)
