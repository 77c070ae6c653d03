"""Benchmark: 256px GAR (GeneratorWithMap) forward renders/sec on one chip.

Measures the BASELINE.md headline config: the full conditioned forward —
mapping network, rasterized normal-map pyramid, NIM FiLM conditioning, all
styled convs — at 256x256, bf16 compute, on the real TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target (BASELINE.md): 5000 renders/sec/chip on v5e.
"""

from __future__ import annotations

import json
import time


def main():
    import jax
    import jax.numpy as jnp

    from stylerenderer_tpu.face3d import mesh_point_normal, synthetic_face
    from stylerenderer_tpu.models import GeneratorWithMap

    size = 256
    batch = 16
    latent = 512

    gen = GeneratorWithMap(
        size, latent, 8, dtype=jnp.bfloat16, pyramid_mode="downsample"
    )
    # production-scale mesh (BFM is ~53k verts / ~105k tris; synthetic stand-in)
    face, tri = synthetic_face(180, 280, shape_dim=80, expression_dim=29)

    rng = jax.random.PRNGKey(0)
    x = face.random_input(rng, batch)
    vert = face(x)
    norm = mesh_point_normal(vert, tri)
    z = jax.random.normal(jax.random.PRNGKey(1), (batch, latent))
    variables = gen.init(
        {"params": jax.random.PRNGKey(2), "noise": jax.random.PRNGKey(3)},
        [z], (vert, norm, tri),
    )
    params = variables["params"]

    @jax.jit
    def forward(params, z, vert, norm):
        img, _, _ = gen.apply(
            {"params": params}, [z], (vert, norm, tri),
            rngs={"noise": jax.random.PRNGKey(7)},
        )
        return img

    # warm up / compile
    out = forward(params, z, vert, norm)
    jax.block_until_ready(out)

    n_iters = 20
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = forward(params, z, vert, norm)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    renders_per_sec = n_iters * batch / dt
    print(
        json.dumps(
            {
                "metric": "gar_256px_renders_per_sec_per_chip",
                "value": round(renders_per_sec, 2),
                "unit": "renders/s",
                "vs_baseline": round(renders_per_sec / 5000.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
