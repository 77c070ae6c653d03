"""Pin down the +20 ms attr-mode binning delta (probe_pyr_ab2): inline the
binning pipeline (setup -> key -> 20-operand sort -> dat stack+pad) and vary
ONLY the source of the 9 extra operands:

  a. no extras (11-operand sort)
  b. extras = cheap dynamic values derived from px (no gather) — if this
     matches c/d, the SORT's operand width is the cost; if it matches a,
     the attr PREP (gather/relayout) is the cost
  c. extras = corner-gathered norm, current formulation (batch-trailing
     gather + [3,C,B,nf] relayout)
  d. extras = 3 per-corner minor-axis gathers (no post-transpose)
  e. extras = corner-gathered norm CLOSED OVER (constant-folded prep)

Every variant is consumed via jnp.mean(dat) so nothing can be DCE'd/narrowed.

python benchmarks/probe_binsplit2.py [batch] [iters]
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
    print(f"{name:60s} {dt * 1e3:8.2f} ms/iter", flush=True)
    return dt


def main(B=16, iters=10):
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from stylerenderer_tpu.ops.rasterize_binned import _setup

    face, tri, vert, norm = production_face(B)
    nf = tri.shape[0]
    nv = vert.shape[1]
    ntiles = (256 // 16) ** 2
    print(f"B={B} nf={nf}", flush=True)

    def bins(v, extras_fn):
        """extras_fn(b_index-free per-batch px) -> tuple of [nf] operands,
        built OUTSIDE vmap as [B, n_extra, nf] (or () for none)."""
        ex = extras_fn()  # [B, E, nf] or None

        def per_batch(vb, exb):
            px, py, z, persp_ok, _x0, _y0, valid, span = _setup(
                vb, tri, 256, 256, False, 1e-6)
            tier = jnp.minimum(span.astype(jnp.int32) // 2, 3)
            home = jnp.clip(
                (px[:, 0].astype(jnp.int32) // 16), 0, 15) * 16 + jnp.clip(
                (py[:, 0].astype(jnp.int32) // 16), 0, 15)
            key = jnp.where(valid, tier * ntiles + home, 5 * ntiles)
            ids = jnp.arange(nf, dtype=jnp.int32)
            extra = () if exb is None else tuple(exb[e] for e in
                                                 range(exb.shape[0]))
            ops = lax.sort(
                (key.astype(jnp.int32),
                 px[:, 0], px[:, 1], px[:, 2],
                 py[:, 0], py[:, 1], py[:, 2],
                 z[:, 0], z[:, 1], z[:, 2], ids.astype(jnp.float32)) + extra,
                num_keys=1,
            )
            rows = list(ops[1:])
            return jnp.stack(rows, axis=0)

        if ex is None:
            dat = jax.vmap(lambda vb: per_batch(vb, None))(v)
        else:
            dat = jax.vmap(per_batch)(v, ex)
        dat = jnp.pad(dat, ((0, 0), (0, 0), (0, (-nf) % 512 + 512)))
        return jnp.mean(dat)

    cidx = jnp.clip(tri, 0, nv - 1).reshape(-1)

    timed(lambda d, v: bins(v + d, lambda: None), (vert,), iters,
          "a. 11-op sort, no extras")

    def cheap_extras_holder(v):
        def f():
            base = jnp.broadcast_to(
                jnp.linspace(0.0, 1.0, nf)[None, None, :], (B, 9, nf))
            return base + jnp.mean(v)
        return f

    timed(lambda d, v: bins(v + d, cheap_extras_holder(v + d)), (vert,),
          iters, "b. 20-op sort, cheap dynamic extras (no gather)")

    def cur_extras(n):
        def f():
            ab = n.astype(jnp.float32)
            av = ab.transpose(1, 0, 2).reshape(nv, B * 3)[cidx]
            av = av.reshape(nf, 3, B, 3).transpose(2, 1, 3, 0)  # [B,3,C,nf]
            return av.reshape(B, 9, nf)
        return f

    timed(lambda d, v, n: bins(v + d, cur_extras(n)), (vert, norm), iters,
          "c. 20-op sort, gathered extras (current form), ARG")

    def corner_extras(n):
        def f():
            src = n.astype(jnp.float32).transpose(0, 2, 1).reshape(B * 3, nv)
            outs = []
            for k in range(3):
                ik = jnp.clip(tri[:, k], 0, nv - 1)
                outs.append(src[:, ik].reshape(B, 3, nf))  # [B, C, nf]
            return jnp.concatenate(outs, axis=1)  # [B, 9, nf]
        return f

    timed(lambda d, v, n: bins(v + d, corner_extras(n)), (vert, norm), iters,
          "d. 20-op sort, 3 minor-axis corner gathers, ARG")

    timed(lambda d, v: bins(v + d, cur_extras(norm)), (vert,), iters,
          "e. 20-op sort, gathered extras CLOSED OVER")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 16,
         int(sys.argv[2]) if len(sys.argv) > 2 else 10)
