"""One-off: which gather formulation is fastest on this TPU for the
winner_coeff per-pixel vertex lookups, and sort-with-operands vs
sort-then-gather for build_bins.

python benchmarks/profile_gather.py
"""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax import lax

from benchmarks.common import production_face, timed


def main():
    B, h, w = 8, 256, 256
    face, tri, vert, norm = production_face(B)
    nf = tri.shape[0]
    nv = vert.shape[1]
    win = jax.random.randint(jax.random.PRNGKey(0), (B, h, w), -1, nf)
    win_safe = jnp.clip(win, 0, nf - 1)
    tri = jnp.asarray(tri, jnp.int32)
    print(f"nv={nv} nf={nf} B={B} {h}x{w}")

    # -- variant 1: current (advanced indexing with arange batch) --
    @jax.jit
    def v1(v, win_safe, tex):
        vidx = tri[win_safe]  # [B,H,W,3]
        bidx = jnp.arange(B)[:, None, None, None]
        pts = v[bidx, vidx]
        gtex = tex[bidx, vidx]
        return pts.sum() + gtex.sum()

    print(f"v1 arange-adv:     {timed(v1, vert, win_safe, norm)*1e3:7.1f} ms")

    # -- variant 2: flatten batch into the index, single flat row gather --
    @jax.jit
    def v2(v, win_safe, tex):
        vidx = tri[win_safe]  # [B,H,W,3]
        flat = vidx + (jnp.arange(B, dtype=jnp.int32) * nv)[:, None, None, None]
        vt = jnp.concatenate([v, tex], -1).reshape(B * nv, 6)
        g = vt[flat.reshape(-1)].reshape(B, h, w, 3, 6)
        return g[..., :3].sum() + g[..., 3:].sum()

    print(f"v2 flat-rows:      {timed(v2, vert, win_safe, norm)*1e3:7.1f} ms")

    # -- variant 3: vmap of per-batch simple gather --
    @jax.jit
    def v3(v, win_safe, tex):
        vidx = tri[win_safe]

        def pb(vb, ib, tb):
            return vb[ib].sum() + tb[ib].sum()

        return jax.vmap(pb)(v, vidx, tex).sum()

    print(f"v3 vmap-simple:    {timed(v3, vert, win_safe, norm)*1e3:7.1f} ms")

    # -- variant 4: take_along_axis --
    @jax.jit
    def v4(v, win_safe, tex):
        vidx = tri[win_safe].reshape(B, -1)  # [B, HW*3]
        vt = jnp.concatenate([v, tex], -1)  # [B, nv, 6]
        g = jnp.take_along_axis(vt, vidx[:, :, None], axis=1)
        return g.sum()

    print(f"v4 take_along:     {timed(v4, vert, win_safe, norm)*1e3:7.1f} ms")

    # -- variant 5: one-hot matmul (MXU does the gather) --
    # out[p, :] = onehot[p, nv] @ vt[nv, 6] — absurd FLOPs but MXU is idle
    # (probably loses at nv=50k; measure anyway)

    # -- sort variants for build_bins --
    key = jax.random.randint(jax.random.PRNGKey(1), (B, nf), 0, 5 * 1024)
    feat = jax.random.normal(jax.random.PRNGKey(2), (B, 10, nf))

    @jax.jit
    def s1(key, feat):
        def pb(kb, fb):
            ids = jnp.arange(nf, dtype=jnp.int32)
            ks, iss = lax.sort((kb, ids), num_keys=1)
            g = fb[:, iss]  # [10, nf] column gather
            return g.sum() + ks.sum()

        return jax.vmap(pb)(key, feat).sum()

    print(f"s1 sort2+colgather:{timed(s1, key, feat)*1e3:7.1f} ms")

    @jax.jit
    def s2(key, feat):
        def pb(kb, fb):
            ops = lax.sort((kb,) + tuple(fb[i] for i in range(10)), num_keys=1)
            return sum(o.sum() for o in ops[1:]) + ops[0].sum()

        return jax.vmap(pb)(key, feat).sum()

    print(f"s2 sort-11op:      {timed(s2, key, feat)*1e3:7.1f} ms")

    @jax.jit
    def s3(key, feat):
        def pb(kb, fb):
            ids = jnp.arange(nf, dtype=jnp.int32)
            ks, iss = lax.sort((kb, ids), num_keys=1)
            g = fb.T[iss]  # [nf, 10] row gather (then no transpose back)
            return g.sum() + ks.sum()

        return jax.vmap(pb)(key, feat).sum()

    print(f"s3 sort2+rowgather:{timed(s3, key, feat)*1e3:7.1f} ms")


if __name__ == "__main__":
    main()
