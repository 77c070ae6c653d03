"""Fine-grained 256px GAR forward split on the real chip:

  - matmul calibration (chip peak)
  - synthesis only (convs, styled path)
  - noise generation only (per-layer jax.random.normal draws)
  - normal pyramid total ('each' = one-pass multi-level Pallas + interp)
  - binning only (build_bins_multi: the per-sample 11-operand sort)
  - winner kernel only (pallas_call on prebuilt bins)
  - interpolation only (_interp_from_win at every level from fixed winners)

All timed with the honest methodology: loop inside one jit over loop-variant
operands, host-readback barrier (benchmarks/common.sync).

python benchmarks/profile_split.py [batch] [iters]
"""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import time

import numpy as np
import jax
import jax.numpy as jnp

from benchmarks.common import production_face


def timed_scan(fn, xs_dict, static_dict, iters, name):
    """fn(perturbed xs, static) -> scalar; scan over iters perturbations."""

    @jax.jit
    def many(xs, static, deltas):
        def body(acc, d):
            pert = {k: v + d for k, v in xs.items()}
            return acc + fn(pert, static), None

        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), deltas)
        return acc

    deltas = jax.random.normal(jax.random.PRNGKey(9), (iters,)) * 1e-5
    float(np.asarray(many(xs_dict, static_dict, deltas)))  # compile+warm
    t0 = time.perf_counter()
    float(np.asarray(many(xs_dict, static_dict, deltas)))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:28s} {dt * 1e3:8.2f} ms/iter")
    return dt


def main(B: int = 16, iters: int = 10):
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from stylerenderer_tpu.models import GeneratorWithMap
    from stylerenderer_tpu.ops.rasterize import (
        _interp_from_win, rasterize_pyramid,
    )
    from stylerenderer_tpu.ops.rasterize_pallas import (
        build_bins_multi, rasterize_winners_pallas_multi,
    )

    size, latent = 256, 512
    face, tri, vert, norm = production_face(B)
    print(f"batch {B}, iters {iters}, mesh {tri.shape[0]} tris")

    # --- matmul calibration (8x4096^3 bf16) ---
    a = jax.random.normal(jax.random.PRNGKey(0), (8, 4096, 4096), jnp.bfloat16)
    bm = jax.random.normal(jax.random.PRNGKey(1), (4096, 4096), jnp.bfloat16)
    dt = timed_scan(
        lambda xs, st: jnp.mean(
            jnp.einsum("gij,jk->gik", xs["a"], st,
                       preferred_element_type=jnp.float32)),
        {"a": a}, bm, iters, "matmul 8x4096^3 bf16")
    print(f"{'':28s} -> {2 * 8 * 4096**3 / dt / 1e12:8.1f} TFLOP/s")

    gen = GeneratorWithMap(size, latent, 8, dtype=jnp.bfloat16,
                           pyramid_mode="each")
    z = jax.random.normal(jax.random.PRNGKey(1), (B, latent))
    variables = gen.init(
        {"params": jax.random.PRNGKey(2), "noise": jax.random.PRNGKey(3)},
        [z], (vert, norm, tri))
    params = variables["params"]

    # --- full forward ('each') ---
    def full(xs, st):
        img, _, _ = gen.apply(
            {"params": st}, [xs["z"]], (xs["v"], norm, tri),
            rngs={"noise": jax.random.PRNGKey(7)})
        return jnp.mean(img.astype(jnp.float32))

    dt_full = timed_scan(full, {"z": z, "v": vert}, params, iters,
                         "full forward (each)")

    # --- synthesis only (fixed pyramid) ---
    pyr = jax.jit(lambda v, n: gen.apply(
        {"params": params}, (v, n, tri), method=gen.normal_pyramid
    ))(vert, norm)
    latent_full = jnp.tile(
        gen.apply({"params": params}, z, method=gen.get_latent)[:, None, :],
        (1, gen.n_latent, 1))

    def synth(xs, st):
        img = gen.apply({"params": st}, xs["lat"], [p + xs["lat"][0, 0, 0] * 0 for p in pyr],
                        method=gen.synthesize,
                        rngs={"noise": jax.random.PRNGKey(7)})
        return jnp.mean(img.astype(jnp.float32))

    dt_syn = timed_scan(synth, {"lat": latent_full}, params, iters,
                        "synthesis only")

    # --- mapping only ---
    def mapping(xs, st):
        return jnp.mean(gen.apply({"params": st}, xs["z"],
                                  method=gen.get_latent))

    timed_scan(mapping, {"z": z}, params, iters, "mapping MLP only")

    # --- noise generation only (what NoiseInjection draws per forward) ---
    num_layers = gen.num_layers

    def noisegen(xs, st):
        key = jax.random.fold_in(jax.random.PRNGKey(7), xs["z"][0, 0].astype(jnp.int32))
        acc = jnp.zeros((), jnp.float32)
        for i in range(num_layers):
            res = 2 ** ((i + 5) // 2)
            n = jax.random.normal(jax.random.fold_in(key, i), (B, res, res, 1))
            acc += jnp.mean(n)
        return acc

    timed_scan(noisegen, {"z": z}, params, iters, "noise draws only")

    # --- pyramid total ('each' path as the model runs it) ---
    sizes = [4] + [2 ** i for i in range(3, 9)]

    def pyramid(xs, st):
        outs = rasterize_pyramid(xs["v"], norm, tri, sizes)
        return sum(jnp.mean(o.astype(jnp.float32)) for o in outs)

    dt_pyr = timed_scan(pyramid, {"v": vert}, params, iters,
                        "pyramid total (each)")

    # --- binning only ---
    def bins(xs, st):
        dat, starts = build_bins_multi(xs["v"], tri, 256, 5, False, 1e-6, 16)
        return jnp.mean(dat[:, 9, :]) + jnp.mean(starts.astype(jnp.float32))

    dt_bin = timed_scan(bins, {"v": vert}, params, iters, "binning only (sort)")

    # --- winner kernel total (bins + kernel) ---
    def winners(xs, st):
        outs = rasterize_winners_pallas_multi(xs["v"], tri, 256, 5)
        return sum(jnp.mean(o.astype(jnp.float32)) for o in outs)

    dt_win = timed_scan(winners, {"v": vert}, params, iters,
                        "bins + winner kernel")

    # --- fused pyramid (in-kernel attr interpolation, no gathers) ---
    from stylerenderer_tpu.ops.rasterize import rasterize_pyramid_fused

    def pyramid_fused(xs, st):
        outs = rasterize_pyramid_fused(xs["v"], norm, tri, sizes)
        return sum(jnp.mean(o.astype(jnp.float32)) for o in outs)

    timed_scan(pyramid_fused, {"v": vert}, params, iters,
               "pyramid fused (each)")

    def winners_fused(xs, st):
        outs = rasterize_winners_pallas_multi(xs["v"], tri, 256, 5,
                                              attrs=norm)
        return sum(jnp.mean(va) for va, _ in outs)

    timed_scan(winners_fused, {"v": vert}, params, iters,
               "bins + fused kernel")

    # --- interpolation only (fixed winners, variant verts) ---
    wins = jax.jit(
        lambda v: rasterize_winners_pallas_multi(v, tri, 256, 5)
    )(vert)

    def interp(xs, st):
        acc = jnp.zeros((), jnp.float32)
        for win, s in zip(wins, [256, 128, 64, 32, 16]):
            out = _interp_from_win(xs["v"], norm, tri, win, s, s, False, 1e-6)
            acc += jnp.mean(out.astype(jnp.float32))
        return acc

    dt_int = timed_scan(interp, {"v": vert}, params, iters,
                        "interp only (5 levels)")

    # --- row-gather interp: ONE contiguous per-triangle row per pixel ---
    from stylerenderer_tpu.ops.rasterize import _coeff_from_pts

    def interp_rows(xs, st):
        vv = xs["v"]
        src = jnp.concatenate([vv, norm], -1)  # [B, nv, 6]
        tbl = jnp.take(src, tri.reshape(-1), axis=1).reshape(
            vv.shape[0], -1, 18)  # [B, nf, 18]
        acc = jnp.zeros((), jnp.float32)
        for win, s in zip(wins, [256, 128, 64, 32, 16]):
            Bn = vv.shape[0]
            idx = jnp.clip(win, 0, tri.shape[0] - 1).reshape(Bn, s * s, 1)
            rows = jnp.take_along_axis(tbl, idx, axis=1)
            rows = rows.reshape(Bn, s, s, 3, 6)
            pts, gtex = rows[..., :3], rows[..., 3:]
            coeff = _coeff_from_pts(pts, s, s, False, 1e-6)
            coeff = jnp.where((win >= 0)[..., None], coeff, 0.0)
            out = jnp.sum(gtex * coeff[..., None], axis=-2)
            acc += jnp.mean(out.astype(jnp.float32))
        return acc

    timed_scan(interp_rows, {"v": vert}, params, iters,
               "interp rowgather (5 lvls)")

    print(f"\nsummary B{B}: full {dt_full*1e3:.1f} = synth {dt_syn*1e3:.1f}"
          f" + pyramid {dt_pyr*1e3:.1f} (bins {dt_bin*1e3:.1f}, kernel "
          f"{(dt_win-dt_bin)*1e3:.1f}, interp {dt_int*1e3:.1f})"
          f" | renders/s full: {B/dt_full:.1f}, synth-only: {B/dt_syn:.1f}")


if __name__ == "__main__":
    main(*(int(x) for x in sys.argv[1:3]))
