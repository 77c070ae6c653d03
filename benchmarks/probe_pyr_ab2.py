"""Bisect the ~20 ms norm-as-ARG vs norm-CLOSED-OVER fused-pyramid delta
(probe_pyr_ab): is it in the binning (gather + 20-operand sort + dat
assembly) or in the kernel/glue? Every reader consumes the WHOLE tensor
(jnp.mean over all rows) so XLA cannot narrow the sort or DCE rows — the
earlier probe_binsplit sort rows read one element and were silently
simplified.

python benchmarks/probe_pyr_ab2.py [batch] [iters]
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
    from stylerenderer_tpu.ops.rasterize_pallas import (
        build_bins_multi, rasterize_winners_pallas_multi,
    )

    face, tri, vert, norm = production_face(B)

    def bins_read(v, n):
        dat, starts = build_bins_multi(v, tri, 256, 7, False, 1e-6, 16,
                                       attrs=n)
        return jnp.mean(dat) + jnp.mean(starts.astype(jnp.float32))

    # (1) full binning, norm CLOSED OVER
    timed(lambda d, v: bins_read(v + d, norm), (vert,), iters,
          "binning FULL dat read, norm CLOSED OVER")
    # (2) full binning, norm as ARG
    timed(lambda d, v, n: bins_read(v + d, n), (vert, norm), iters,
          "binning FULL dat read, norm as ARG")

    # (3) attr-only variance (v closed over): isolates whether the delta
    # rides the attr columns specifically
    timed(lambda d, v, n: bins_read(v, n + d), (vert, norm), iters,
          "binning FULL dat read, v CLOSED OVER, attr ARG")

    # (4) full kernel from binning, both args (reference for subtraction)
    def full_read(v, n):
        outs = rasterize_winners_pallas_multi(v, tri, 256, 7, attrs=n)
        return sum(jnp.mean(va) for va, _ in outs)

    timed(lambda d, v, n: full_read(v + d, n), (vert, norm), iters,
          "bins+kernel (7-level attr), norm as ARG")
    timed(lambda d, v: full_read(v + d, norm), (vert,), iters,
          "bins+kernel (7-level attr), norm CLOSED OVER")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 16,
         int(sys.argv[2]) if len(sys.argv) > 2 else 10)
