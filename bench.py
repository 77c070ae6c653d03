"""Benchmark: 256px GAR (GeneratorWithMap) forward renders/sec on one chip.

Measures the BASELINE.md headline config: the full conditioned forward —
mapping network, rasterized normal-map pyramid, NIM FiLM conditioning, all
styled convs — at 256x256, bf16 compute, on the real TPU.

Timing methodology (this backend): ``jax.block_until_ready`` does NOT sync
through the axon tunnel, so we (a) run the timed iterations INSIDE one jitted
``lax.scan`` (no per-step dispatch round-trips) and (b) close the timing
region with a host readback of one element (benchmarks/common.py).

Headline number is the reference-exact ``pyramid_mode='each'`` (one rasterize
per resolution, /root/reference/model.py:260-270); the TPU fast path
(``'downsample'``: rasterize once at 256, average-pool the pyramid) is
reported alongside in the same JSON line.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
Baseline target (BASELINE.md): 5000 renders/sec/chip on v5e.
"""

from __future__ import annotations

import json
import time


def _bench_mode(mode: str, batch: int, n_iters: int) -> float:
    import jax

    # persistent compile cache: the 5 pyramid-level Pallas kernels cost
    # minutes each through this backend's remote-compile relay on a cold
    # process; cache them repo-locally so reruns (e.g. the driver's) are fast
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp
    import numpy as np

    from stylerenderer_tpu.face3d import mesh_point_normal, synthetic_face
    from stylerenderer_tpu.models import GeneratorWithMap

    size, latent = 256, 512
    gen = GeneratorWithMap(size, latent, 8, dtype=jnp.bfloat16, pyramid_mode=mode)
    # production-scale mesh (BFM is ~53k verts / ~105k tris; synthetic stand-in)
    face, tri = synthetic_face(180, 280, shape_dim=80, expression_dim=29)

    rng = jax.random.PRNGKey(0)
    x = face.random_input(rng, batch)
    vert = face(x)
    norm = mesh_point_normal(vert, tri)
    z = jax.random.normal(jax.random.PRNGKey(1), (n_iters, batch, latent))
    # per-iteration mesh perturbation: training renders a FRESH mesh every
    # batch, so the mesh must be loop-VARIANT in the timing scan — otherwise
    # XLA hoists the whole rasterization out of the loop (measured: it does)
    dv = jax.random.normal(jax.random.PRNGKey(4), (n_iters, 1, 1, 3)) * 1e-4
    variables = gen.init(
        {"params": jax.random.PRNGKey(2), "noise": jax.random.PRNGKey(3)},
        [z[0]], (vert, norm, tri),
    )
    params = variables["params"]

    @jax.jit
    def forward_many(params, zs, dvs, vert, norm):
        def body(acc, zd):
            z_i, dv_i = zd
            img, _, _ = gen.apply(
                {"params": params}, [z_i], (vert + dv_i, norm, tri),
                rngs={"noise": jax.random.PRNGKey(7)},
            )
            # checksum over the WHOLE image so DCE can't drop any of the work
            return acc + jnp.mean(img.astype(jnp.float32)), None

        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), (zs, dvs))
        return acc

    def sync(v):
        return float(np.asarray(v).ravel()[0])  # host readback = real barrier

    sync(forward_many(params, z, dv, vert, norm))  # compile + warm
    t0 = time.perf_counter()
    sync(forward_many(params, z, dv, vert, norm))
    dt = time.perf_counter() - t0
    return n_iters * batch / dt


def main():
    batch, n_iters = 16, 20
    each_rps = _bench_mode("each", batch, n_iters)
    down_rps = _bench_mode("downsample", batch, n_iters)
    print(
        json.dumps(
            {
                "metric": "gar_256px_renders_per_sec_per_chip",
                "value": round(each_rps, 2),
                "unit": "renders/s",
                "vs_baseline": round(each_rps / 5000.0, 4),
                "pyramid_mode": "each (reference-exact)",
                "downsample_mode_renders_per_sec": round(down_rps, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
