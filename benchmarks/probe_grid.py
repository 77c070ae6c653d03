"""Isolate the pallas grid-step overhead of the multi kernel's launch
shape: an EMPTY kernel (constant output, no DMA, no scan) on the same
(B, ntiles) grid and output block as the production launch, vs the same
total output written by one fat instance per batch element.

python benchmarks/probe_grid.py [batch] [iters]
"""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl


def timed(fn, iters, name):
    @jax.jit
    def many(deltas):
        def body(acc, d):
            return acc + fn(d), None

        acc, _ = lax.scan(body, jnp.zeros((), jnp.float32), deltas)
        return acc

    deltas = jnp.arange(iters, dtype=jnp.float32)
    float(np.asarray(many(deltas)))
    t0 = time.perf_counter()
    float(np.asarray(many(deltas)))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:44s} {dt * 1e3:8.2f} ms/iter", flush=True)


def main(B=16, iters=20):
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    P, C, NT = 344, 4, 256

    def k_flat(x_ref, o_ref):
        o_ref[0, 0, :, :] = jnp.full((P, C), x_ref[0, 0, 0, 0])

    def flat(d):
        x = jnp.full((1, 1, 1, 1), d)
        out = pl.pallas_call(
            k_flat,
            grid=(B, NT),
            in_specs=[pl.BlockSpec((1, 1, 1, 1), lambda b, t: (0, 0, 0, 0))],
            out_specs=pl.BlockSpec((1, 1, P, C), lambda b, t: (b, t, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((B, NT, P, C), jnp.float32),
        )(x)
        return jnp.sum(out[:, 0, 0, 0])

    timed(flat, iters, f"empty kernel, grid ({B},{NT})")
    # measured: 2.67 ms/iter at (16,256) — the pallas grid-step pipeline
    # itself is a minor part of the multi kernel's fixed cost; the rest is
    # the minimum-one-chunk-per-tile eval quantization (see
    # profile_overhead.py). (A one-fat-instance-per-batch variant OOMs
    # scoped VMEM at this output size — whole-block output residency.)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 16,
         int(sys.argv[2]) if len(sys.argv) > 2 else 20)
