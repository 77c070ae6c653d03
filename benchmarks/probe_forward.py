"""Account for every ms of the full GAR each-mode forward: pyramid via the
model wrapper vs direct op call, full forward with zero vs per-layer RNG
noise — isolates the noise-RNG (threefry) cost and any wrapper overhead.

python benchmarks/probe_forward.py [iters]
"""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from benchmarks.common import production_face


def timed(fn, args, iters, name, B=16):
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
    print(f"{name:48s} {dt * 1e3:8.2f} ms/iter  ({B / dt:6.0f} img/s)",
          flush=True)
    return dt


def main(iters=10):
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from stylerenderer_tpu.models import GeneratorWithMap
    from stylerenderer_tpu.ops.rasterize import rasterize_pyramid_fused

    size, latent, B = 256, 512, 16
    gen = GeneratorWithMap(size, latent, 8, dtype=jnp.bfloat16,
                           pyramid_mode="each")
    face, tri, vert, norm = production_face(B)
    z = jax.random.normal(jax.random.PRNGKey(1), (B, latent))
    variables = gen.init(
        {"params": jax.random.PRNGKey(2), "noise": jax.random.PRNGKey(3)},
        [z], (vert, norm, tri),
    )
    params = variables["params"]
    sizes = [4] + [2 ** i for i in range(3, 9)]

    timed(lambda d, v, n: sum(
        jnp.mean(m.astype(jnp.float32))
        for m in rasterize_pyramid_fused(v + d, n, tri, sizes)),
        (vert, norm), iters, "rasterize_pyramid_fused direct")

    timed(lambda d, v, n: sum(
        jnp.mean(m.astype(jnp.float32))
        for m in gen.apply({"params": params}, (v + d, n, tri),
                           method=gen.normal_pyramid)),
        (vert, norm), iters, "normal_pyramid via model")

    num_layers = gen.num_layers
    zero_noise = [jnp.zeros((1, 1, 1, 1))] * num_layers

    timed(lambda d, zz, v, n: jnp.mean(
        gen.apply({"params": params}, [zz], (v + d, n, tri),
                  noise=zero_noise)[0].astype(jnp.float32)),
        (z, vert, norm), iters, "full forward, ZERO noise")

    timed(lambda d, zz, v, n: jnp.mean(
        gen.apply({"params": params}, [zz], (v + d, n, tri),
                  rngs={"noise": jax.random.PRNGKey(7)},
                  )[0].astype(jnp.float32)),
        (z, vert, norm), iters, "full forward, RNG noise")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 10)
