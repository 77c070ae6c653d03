"""Conv-side split of the GAR forward: where does synthesis time go?

- mapping network (8x EqualLinear)
- NIM stack alone (norm1 + per-resolution norm_to_style ResBlocks on the
  normal-map pyramid) — 3/4-channel convs at up to 256px are the MXU's worst
  case (channel dim ~3 of 128 lanes), so this is the prime suspect for the
  gap between the synthesis time and the conv-stack roofline (~6 ms at
  121 TFLOP/s for ~45 GFLOP/img x 16)
- synthesis total (convs + NIM, given a precomputed pyramid)
- full forward at batch 16 / 32 (throughput scaling)

python benchmarks/profile_convs.py [iters]
"""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from benchmarks.common import production_face


def timed_scan(fn, args, iters, name, batch):
    """Loop-variant scan + host readback (CLAUDE.md timing methodology).
    ``fn(delta, *args) -> scalar`` with delta varying per iteration."""

    @jax.jit
    def many(args, deltas):
        def body(acc, d):
            return acc + fn(d, *args), None

        acc, _ = lax.scan(body, jnp.zeros((), jnp.float32), deltas)
        return acc

    deltas = jax.random.normal(jax.random.PRNGKey(9), (iters,)) * 1e-5
    float(np.asarray(many(args, deltas)))
    t0 = time.perf_counter()
    float(np.asarray(many(args, deltas)))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:44s} {dt * 1e3:8.2f} ms/iter  ({batch / dt:7.0f} img/s)",
          flush=True)
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

    pyr = jax.jit(
        lambda v, n: gen.apply({"params": params}, (v, n, tri),
                               method=gen.normal_pyramid)
    )(vert, norm)
    pyr = [jnp.asarray(m) for m in pyr]

    # mapping network
    timed_scan(
        lambda d, z: jnp.sum(
            gen.apply({"params": params}, z + d, method=gen.get_latent)
        ).astype(jnp.float32),
        (z,), iters, "mapping network (8 fc)", B,
    )

    # NIM stack alone
    def nim(self, maps):
        outs = [self.norm1(maps[0].astype(self.dtype))]
        for i, m in enumerate(maps[1:]):
            outs.append(self.norm_to_style[i](m.astype(self.dtype)))
        return sum(jnp.sum(o.astype(jnp.float32)) for o in outs)

    timed_scan(
        lambda d, *p: gen.apply(
            {"params": params}, [m + d for m in p], method=nim),
        tuple(pyr), iters, "NIM stack (norm_to_style ResBlocks)", B,
    )

    # synthesis (convs + NIM) from the precomputed pyramid
    latent_full = jnp.tile(
        gen.apply({"params": params}, z, method=gen.get_latent)[:, None, :],
        (1, gen.n_latent, 1),
    )

    timed_scan(
        lambda d, lat, *p: jnp.mean(
            gen.apply({"params": params}, lat + d, list(p),
                      method=gen.synthesize,
                      rngs={"noise": jax.random.PRNGKey(7)}
                      ).astype(jnp.float32)),
        (latent_full,) + tuple(pyr), iters, "synthesize (convs+NIM)", B,
    )

    # full forward batch sweep
    for b in (16, 32):
        zb = jax.random.normal(jax.random.PRNGKey(1), (b, latent))
        reps = -(-b // B)
        vb = jnp.tile(vert, (reps, 1, 1))[:b]
        nb = jnp.tile(norm, (reps, 1, 1))[:b]
        timed_scan(
            lambda d, zz, vv, nn: jnp.mean(
                gen.apply({"params": params}, [zz], (vv + d, nn, tri),
                          rngs={"noise": jax.random.PRNGKey(7)},
                          )[0].astype(jnp.float32)),
            (zb, vb, nb), iters, f"full GAR forward (each), batch {b}", b,
        )


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 10)
