"""GAR forward split: synthesis-only (convs) vs rasterization vs full.

python benchmarks/bench_generator.py
"""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from benchmarks.common import production_face, timed


def main():
    from stylerenderer_tpu.models import GeneratorWithMap

    size, latent, B = 256, 512, 16
    gen = GeneratorWithMap(size, latent, 8, dtype=jnp.bfloat16,
                           pyramid_mode="downsample")
    face, tri, vert, norm = production_face(B)
    z = jax.random.normal(jax.random.PRNGKey(1), (B, latent))
    variables = jax.jit(gen.init)(
        {"params": jax.random.PRNGKey(2), "noise": jax.random.PRNGKey(3)},
        [z], (vert, norm, tri),
    )
    params = variables["params"]

    pyramid = jax.jit(
        lambda v, n: gen.apply({"params": params}, (v, n, tri),
                               method=gen.normal_pyramid)
    )
    pyr = pyramid(vert, norm)

    latent_full = jnp.tile(
        gen.apply({"params": params}, z, method=gen.get_latent)[:, None, :],
        (1, gen.n_latent, 1),
    )
    synth = jax.jit(
        lambda lat, p: gen.apply({"params": params}, lat, list(p),
                                 method=gen.synthesize,
                                 rngs={"noise": jax.random.PRNGKey(7)})
    )
    dt = timed(synth, latent_full, pyr)
    print(f"synthesis only (convs):  {dt * 1e3:6.1f} ms  ({B / dt:6.0f} img/s)")

    dtp = timed(pyramid, vert, norm)
    print(f"normal pyramid (raster): {dtp * 1e3:6.1f} ms  ({B / dtp:6.0f} img/s)")

    full = jax.jit(
        lambda z, v, n: gen.apply(
            {"params": params}, [z], (v, n, tri),
            rngs={"noise": jax.random.PRNGKey(7)},
        )[0]
    )
    dtf = timed(full, z, vert, norm)
    print(f"full GAR forward:        {dtf * 1e3:6.1f} ms  ({B / dtf:6.0f} img/s)")


if __name__ == "__main__":
    main()
