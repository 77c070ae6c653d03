"""A/B the fused-pyramid cost under the exact calling conventions of the
profilers that disagree: profile_fused times rasterize_pyramid_fused with
``norm`` CLOSED OVER (a jit constant) and reports ~51 ms/16; probe_forward_gap
times gen.normal_pyramid with ``norm`` as an ARGUMENT and reports ~71 ms/16.
The corner gather is only ~3.6 ms (probe_binsplit), so ~16 ms of the delta is
unexplained — this probe isolates which convention (and which stage) it is.

python benchmarks/probe_pyr_ab.py [batch] [iters]
"""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from benchmarks.common import production_face


def timed(fn, args, iters, name):
    @jax.jit
    def many(args, deltas):
        def body(acc, d):
            return acc + fn(d, *args), None

        acc, _ = lax.scan(body, jnp.zeros((), jnp.float32), deltas)
        return acc

    deltas = jax.random.normal(jax.random.PRNGKey(9), (iters, 1, 1, 3)) * 1e-5
    float(np.asarray(many(args, deltas)))
    t0 = time.perf_counter()
    float(np.asarray(many(args, deltas)))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:56s} {dt * 1e3:8.2f} ms/iter", flush=True)
    return dt


def main(B=16, iters=10):
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from stylerenderer_tpu.ops.rasterize import rasterize_pyramid_fused
    from stylerenderer_tpu.models import GeneratorWithMap

    face, tri, vert, norm = production_face(B)
    sizes = [4] + [2 ** i for i in range(3, 9)]
    read = lambda maps: sum(jnp.mean(m.astype(jnp.float32)) for m in maps)

    # (1) norm CLOSED OVER (profile_fused's convention)
    timed(lambda d, v: read(rasterize_pyramid_fused(v + d, norm, tri, sizes)),
          (vert,), iters, "fused pyramid, norm CLOSED OVER")

    # (2) norm as ARGUMENT (what the model pays)
    timed(lambda d, v, n: read(rasterize_pyramid_fused(v + d, n, tri, sizes)),
          (vert, norm), iters, "fused pyramid, norm as ARG")

    # (3) norm as VARYING value (training truth: fresh normals every step)
    timed(lambda d, v, n: read(
        rasterize_pyramid_fused(v + d, n + d, tri, sizes)),
        (vert, norm), iters, "fused pyramid, norm loop-VARIANT")

    # (4) through the model method (probe_forward_gap's convention)
    gen = GeneratorWithMap(256, 512, 8, dtype=jnp.bfloat16,
                           pyramid_mode="each")
    z = jax.random.normal(jax.random.PRNGKey(1), (B, 512))
    variables = jax.jit(gen.init)(
        {"params": jax.random.PRNGKey(2), "noise": jax.random.PRNGKey(3)},
        [z], (vert, norm, tri),
    )
    params = variables["params"]
    timed(lambda d, v, n: read(gen.apply(
        {"params": params}, (v + d, n, tri), method=gen.normal_pyramid)),
        (vert, norm), iters, "gen.normal_pyramid (model method), norm ARG")

    # (1) again to control chip drift within the run
    timed(lambda d, v: read(rasterize_pyramid_fused(v + d, norm, tri, sizes)),
          (vert,), iters, "fused pyramid, norm CLOSED OVER (repeat)")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 16,
         int(sys.argv[2]) if len(sys.argv) > 2 else 10)
