"""300-iteration face-reconstruction inversion wall clock (BASELINE target).

python benchmarks/bench_inversion.py [iters]
"""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import time

import numpy as np
import jax
import jax.numpy as jnp

from benchmarks.common import production_face, sync


def main(iters: int = 300):
    from stylerenderer_tpu.inversion import ProjectorConfig, make_projector
    from stylerenderer_tpu.models import GeneratorWithMap

    size, latent = 256, 512
    gen = GeneratorWithMap(size, latent, 8, dtype=jnp.bfloat16,
                           pyramid_mode="downsample")
    face, tri, vert, norm = production_face(1)
    z0 = jnp.zeros((1, latent))
    variables = gen.init(
        {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)},
        [z0], (vert, norm, tri),
    )
    cfg = ProjectorConfig(iters=iters, w_lpips=0.0)
    project = jax.jit(make_projector(gen, variables["params"], face, tri, cfg))
    target = jnp.zeros((1, size, size, 3))

    out = project(jax.random.PRNGKey(3), target)
    sync(out["render"])
    t0 = time.time()
    out = project(jax.random.PRNGKey(4), target)
    sync(out["render"])
    dt = time.time() - t0
    print(f"{iters}-iter inversion: {dt:.2f} s/face ({dt / iters * 1e3:.1f} ms/iter)")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 300)
