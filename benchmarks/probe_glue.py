"""Time the multi-kernel un-tiling glue in isolation and compare variants
(the [B, ntl, P_pad, 4] -> 7x [B, s, s, 3] reshuffle costs ~21 ms/16 imgs
in situ — probe_forward_gap — but is DCE'd when outputs feed a mean).

Variants:
  A. current: slice -> 6D reshape -> transpose(0,1,3,2,4,5) -> reshape
  B. merged-minor: reshape [B,nty,ntx,tl,tl*C] -> swap (2,3) -> reshape
  C. bf16 pre-cast of the value channels before the transpose
  D. per-level one-shot: jnp.swapaxes on [B*nty, ntx, tl, tl*C]

Consumption is a 1x1 conv per level (transpose-sensitive — prevents the
DCE that hid the cost in earlier probes).

python benchmarks/probe_glue.py [iters]
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

    deltas = jax.random.normal(jax.random.PRNGKey(9), (iters,)) * 1e-5
    float(np.asarray(many(args, deltas)))
    t0 = time.perf_counter()
    float(np.asarray(many(args, deltas)))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:52s} {dt * 1e3:8.2f} ms/iter", flush=True)
    return dt


def consume(maps):
    """Transpose-sensitive consumer: per-level spatialized mix (a shifted
    elementwise combine across H so the layout must materialize)."""
    acc = jnp.zeros((), jnp.float32)
    for m in maps:
        m = m.astype(jnp.float32)
        acc += jnp.sum(m[:, 1:] * m[:, :-1]) * 1e-6
    return acc


def main(iters=10):
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    B, out_ch, tile, top = 16, 4, 16, 256
    ntx = nty = top // tile
    ntl = ntx * nty
    # fabricate a win array matching the kernel output (values don't matter)
    from stylerenderer_tpu.ops.rasterize_pallas import _multi_level_rows

    P_pad, offsets, blocks, *_ = _multi_level_rows(top, 5, tile, 0)
    win = jax.random.normal(jax.random.PRNGKey(0), (B, ntl, P_pad, out_ch))
    levels = [(k, top >> k, tile >> k) for k in range(5)]

    def glue_current(d, win):
        maps = []
        for k, sl, tl in levels:
            w_k = (win + d)[:, :, offsets[k]:offsets[k] + tl * tl, :]
            w_k = w_k.reshape(B, nty, ntx, tl, tl, out_ch)
            w_k = w_k.transpose(0, 1, 3, 2, 4, 5).reshape(B, sl, sl, out_ch)
            maps.append(w_k[..., :3])
        return consume(maps)

    def glue_merged(d, win):
        maps = []
        for k, sl, tl in levels:
            w_k = (win + d)[:, :, offsets[k]:offsets[k] + tl * tl, :]
            w_k = w_k.reshape(B, nty, ntx, tl, tl * out_ch)
            w_k = w_k.transpose(0, 1, 3, 2, 4)
            w_k = w_k.reshape(B, sl, sl, out_ch)
            maps.append(w_k[..., :3])
        return consume(maps)

    def glue_bf16(d, win):
        maps = []
        wb = (win + d).astype(jnp.bfloat16)
        for k, sl, tl in levels:
            w_k = wb[:, :, offsets[k]:offsets[k] + tl * tl, :]
            w_k = w_k.reshape(B, nty, ntx, tl, tl, out_ch)
            w_k = w_k.transpose(0, 1, 3, 2, 4, 5).reshape(B, sl, sl, out_ch)
            maps.append(w_k[..., :3])
        return consume(maps)

    def glue_swap(d, win):
        maps = []
        for k, sl, tl in levels:
            w_k = (win + d)[:, :, offsets[k]:offsets[k] + tl * tl, :]
            w_k = w_k.reshape(B * nty, ntx, tl, tl * out_ch)
            w_k = jnp.swapaxes(w_k, 1, 2)
            w_k = w_k.reshape(B, sl, sl, out_ch)
            maps.append(w_k[..., :3])
        return consume(maps)

    timed(glue_current, (win,), iters, "glue A: current 6D transpose")
    timed(glue_merged, (win,), iters, "glue B: merged tl*C minor transpose")
    timed(glue_bf16, (win,), iters, "glue C: bf16 pre-cast + 6D transpose")
    timed(glue_swap, (win,), iters, "glue D: swapaxes [B*nty,ntx,tl,tl*C]")

    # floor: pure element-wise pass over the same bytes, no reshuffle
    timed(lambda d, w: jnp.sum((w + d) * 1e-6).astype(jnp.float32),
          (win,), iters, "floor: elementwise over win bytes")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 10)
