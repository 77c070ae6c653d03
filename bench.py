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
    # jitted init: eager runs op-by-op at ~15-20 ms/dispatch on this backend
    variables = jax.jit(gen.init)(
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


def _check_fused_exact(batch: int = 2) -> dict:
    """On-chip exactness audit of the fused pyramid (VERDICT r3 #4): the
    WINNER side runs the raw multi-level kernel (attrs=None) and the VALUES
    side runs the production wrapper ``rasterize_pyramid_fused`` (the full
    custom-VJP glue the GAR forward uses), each compared against the DENSE
    oracle (dense winner search + gather interpolation,
    rasterize.py::_interp_from_win) at every level of the 7-level production
    pyramid. Records whether winner maps and interpolated values are
    BITWISE equal, and the max abs value difference if not."""
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp
    import numpy as np

    from stylerenderer_tpu.face3d import mesh_point_normal, synthetic_face
    from stylerenderer_tpu.ops.rasterize import (
        _dispatch_winners, _interp_from_win, rasterize_pyramid_fused,
    )
    from stylerenderer_tpu.ops.rasterize_pallas import (
        rasterize_winners_pallas_multi,
    )

    face, tri = synthetic_face(180, 280, shape_dim=80, expression_dim=29)
    x = face.random_input(jax.random.PRNGKey(0), batch)
    vert = face(x)
    norm = mesh_point_normal(vert, tri)
    sizes = [256 >> k for k in range(7)]  # 256 .. 4

    wins_f = jax.jit(
        lambda v: rasterize_winners_pallas_multi(v, tri, 256, 7)
    )(vert)
    vals_f = jax.jit(
        lambda v, n: rasterize_pyramid_fused(
            v, n, tri, sizes, method="pallas_multi")
    )(vert, norm.astype(jnp.float32))

    win_exact, val_exact, max_diff = True, True, 0.0
    for win_f, val_f, s in zip(wins_f, vals_f, sizes):
        win_o = _dispatch_winners(vert, tri, s, s, False, 1e-6, "dense")
        val_o = _interp_from_win(
            vert, norm.astype(jnp.float32), tri, win_o, s, s, False, 1e-6
        )
        wf, wo = np.asarray(win_f), np.asarray(win_o)
        vf, vo = np.asarray(val_f), np.asarray(val_o)
        if not (wf == wo).all():
            win_exact = False
        if not (vf == vo).all():
            val_exact = False
        max_diff = max(max_diff, float(np.abs(vf - vo).max()))
    return {
        "fused_winner_bitexact": win_exact,
        "fused_values_bitexact": val_exact,
        "fused_values_max_abs_diff": max_diff,
        "check_levels": sizes,
        "check_batch": batch,
    }


def main():
    import sys

    batch, n_iters = 16, 20
    out = {
        "metric": "gar_256px_renders_per_sec_per_chip",
        "unit": "renders/s",
        "pyramid_mode": "each (reference-exact)",
    }
    if "--check" in sys.argv:
        out.update(_check_fused_exact())
    each_rps = _bench_mode("each", batch, n_iters)
    down_rps = _bench_mode("downsample", batch, n_iters)
    out.update(
        {
            "value": round(each_rps, 2),
            "vs_baseline": round(each_rps / 5000.0, 4),
            "downsample_mode_renders_per_sec": round(down_rps, 2),
        }
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
