"""Split the attr-mode binning cost (~21 ms/16 at nf=100k): the one
batch-shared corner gather vs the 20-operand sort vs the 11-operand sort.
Decides whether round-5 perf work should attack the gather, the sort
width, or neither.

python benchmarks/probe_binsplit.py [batch] [iters]
"""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from benchmarks.common import production_face


def timed(fn, xs, iters, name):
    @jax.jit
    def many(v, deltas):
        def body(acc, d):
            return acc + fn(v + d), None

        acc, _ = lax.scan(body, jnp.zeros((), jnp.float32), deltas)
        return acc

    deltas = jax.random.normal(jax.random.PRNGKey(9), (iters, 1, 1, 3)) * 1e-5
    float(np.asarray(many(xs, deltas)))
    t0 = time.perf_counter()
    float(np.asarray(many(xs, deltas)))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:52s} {dt * 1e3:8.2f} ms/iter", flush=True)
    return dt


def main(B=16, iters=10):
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from stylerenderer_tpu.ops.rasterize_binned import _setup

    face, tri, vert, norm = production_face(B)
    nf = tri.shape[0]
    nv = vert.shape[1]
    print(f"B={B} nf={nf}", flush=True)

    # (a) the batch-shared corner gather alone (build_bins_multi's attr
    # prep). `norm + mean(v)*0` makes the source loop-VARIANT so XLA cannot
    # constant-fold the gather (profile_fused closed over `norm`, which let
    # XLA fold it — its "fused pyramid 51 ms" row was missing ~20 ms of
    # gather that the real model pays; probe_forward_gap's 71 ms
    # normal_pyramid row is the truth).
    def corner_gather(v):
        ab = (norm + jnp.mean(v) * 0.0).astype(jnp.float32)
        Bc, nvc, C = ab.shape
        cidx = jnp.clip(tri, 0, nvc - 1).reshape(-1)
        av = ab.transpose(1, 0, 2).reshape(nvc, Bc * C)[cidx]
        return jnp.mean(av)

    timed(corner_gather, vert, iters, "corner gather [3nf] x [B*C] rows")

    # (a2) batch-LEADING vmapped corner gather (the _setup formulation,
    # which the winner-mode binning totals imply is much cheaper)
    tri_safe = jnp.clip(tri, 0, nv - 1)

    def corner_gather_lead(v):
        ab = (norm + jnp.mean(v) * 0.0).astype(jnp.float32)
        av = jax.vmap(lambda a: a[tri_safe])(ab)  # [B, nf, 3, C]
        return jnp.mean(av)

    timed(corner_gather_lead, vert, iters, "corner gather batch-leading vmap")

    # (a3) positions+attrs in ONE batch-leading gather (what build_bins
    # would pay if _setup's gather also fetched the attr channels)
    def corner_gather_both(v):
        src = jnp.concatenate([v, norm], axis=-1).astype(jnp.float32)
        av = jax.vmap(lambda a: a[tri_safe])(src)  # [B, nf, 3, 6]
        return jnp.mean(av)

    timed(corner_gather_both, vert, iters, "corner gather pos+attr combined")

    # (b/c) sorts at 11 vs 20 operands on real projected data
    def sort_n(v, n_attr_ops):
        def per_batch(vb):
            px, py, z, _ok, _x0, _y0, valid, _span = _setup(
                vb, tri, 256, 256, False, 1e-6)
            key = jnp.where(valid, jnp.int32(1), jnp.int32(2))
            ids = jnp.arange(nf, dtype=jnp.int32)
            extra = tuple(px[:, 0] * (i + 1) for i in range(n_attr_ops))
            ops = lax.sort(
                (key, px[:, 0], px[:, 1], px[:, 2],
                 py[:, 0], py[:, 1], py[:, 2],
                 z[:, 0], z[:, 1], z[:, 2], ids) + extra,
                num_keys=1,
            )
            return ops[1][0] + ops[-1][0]

        return jnp.mean(jax.vmap(per_batch)(v))

    timed(lambda v: sort_n(v, 0), vert, iters, "11-operand sort (winner mode)")
    timed(lambda v: sort_n(v, 9), vert, iters, "20-operand sort (attr mode)")

    # (d) setup alone (projection + validity, no sort)
    def setup_only(v):
        def per_batch(vb):
            px, py, z, *_ = _setup(vb, tri, 256, 256, False, 1e-6)
            return px[0, 0] + py[0, 0] + z[0, 0]

        return jnp.mean(jax.vmap(per_batch)(v))

    timed(setup_only, vert, iters, "projection/setup only (no sort)")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 16,
         int(sys.argv[2]) if len(sys.argv) > 2 else 10)
