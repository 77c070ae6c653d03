"""Find the gap between sum-of-parts (~67 ms/16) and the measured full GAR
forward (~93 ms/16 with the pre-fold kernel): time progressively composed
slices of the forward in one jit each.

python benchmarks/probe_forward_gap.py [iters]
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
    print(f"{name:52s} {dt * 1e3:8.2f} ms/iter", flush=True)
    return dt


def main(iters=10):
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from stylerenderer_tpu.models import GeneratorWithMap

    size, latent, B = 256, 512, 16
    gen = GeneratorWithMap(size, latent, 8, dtype=jnp.bfloat16,
                           pyramid_mode="each")
    face, tri, vert, norm = production_face(B)
    z = jax.random.normal(jax.random.PRNGKey(1), (B, latent))
    variables = jax.jit(gen.init)(
        {"params": jax.random.PRNGKey(2), "noise": jax.random.PRNGKey(3)},
        [z], (vert, norm, tri),
    )
    params = variables["params"]
    latent_full = jnp.tile(
        jax.jit(lambda p, zz: gen.apply(
            {"params": p}, zz, method=gen.get_latent))(params, z)[:, None, :],
        (1, gen.n_latent, 1),
    )
    zero_noise = [jnp.zeros((1, 1, 1, 1))] * gen.num_layers

    # 1. model pyramid method alone (raw kernel + model casts)
    timed(lambda d, v, n: sum(
        jnp.mean(m.astype(jnp.float32))
        for m in gen.apply({"params": params}, (v + d, n, tri),
                           method=gen.normal_pyramid)),
        (vert, norm), iters, "normal_pyramid (model method)")

    # 2. pyramid + synthesize composed in ONE jit (no mapping, zero noise)
    def pyr_synth(d, v, n, lat):
        maps = gen.apply({"params": params}, (v + d, n, tri),
                         method=gen.normal_pyramid)
        img = gen.apply({"params": params}, lat, maps, zero_noise,
                        method=gen.synthesize)
        return jnp.mean(img.astype(jnp.float32))

    timed(pyr_synth, (vert, norm, latent_full), iters,
          "pyramid + synthesize (one jit, zero noise)")

    # 3. + random noise via rngs
    def pyr_synth_noise(d, v, n, lat):
        maps = gen.apply({"params": params}, (v + d, n, tri),
                         method=gen.normal_pyramid)
        img = gen.apply({"params": params}, lat, maps,
                        method=gen.synthesize,
                        rngs={"noise": jax.random.PRNGKey(7)})
        return jnp.mean(img.astype(jnp.float32))

    timed(pyr_synth_noise, (vert, norm, latent_full), iters,
          "pyramid + synthesize (one jit, rng noise)")

    # 4. full forward, zero noise
    timed(lambda d, zz, v, n: jnp.mean(
        gen.apply({"params": params}, [zz], (v + d, n, tri),
                  noise=zero_noise)[0].astype(jnp.float32)),
        (z, vert, norm), iters, "full forward (zero noise)")

    # 5. full forward, rng noise (the bench.py configuration)
    timed(lambda d, zz, v, n: jnp.mean(
        gen.apply({"params": params}, [zz], (v + d, n, tri),
                  rngs={"noise": jax.random.PRNGKey(7)},
                  )[0].astype(jnp.float32)),
        (z, vert, norm), iters, "full forward (rng noise)")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 10)
