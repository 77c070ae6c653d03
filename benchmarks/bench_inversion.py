"""300-iteration face-reconstruction inversion wall clock (BASELINE target:
< 2 s/face with LPIPS + landmark losses on a full v5e chip).

Measures the full BASELINE metric: pixel + LPIPS(vgg) + 68-landmark losses
over (w+, 3DMM params, pose), one jitted lax.scan, zero host round-trips.
The LPIPS backbone is randomly initialized (published weights are not
available offline — converter in eval/lpips.py); the FLOPs and memory
traffic are identical to the pretrained net, so the wall clock is the same.

History: this bench went non-finite at production triangle density through
round 2 (geometry params died by iter ~16). Root cause was sliver-winner
coefficient cancellation; fixed by the [-1,2] clamp in
rasterize._eval_candidate (+ geo-group grad clip in the projector) — see
tests/test_inversion_stability.py. Finite since round 3.

python benchmarks/bench_inversion.py [iters] [batch] [pyramid_mode] [segments]

``pyramid_mode`` (default "downsample", the TPU fast path) selects the
generator's normal-map pyramid: "each" is the reference-exact one-rasterize-
per-resolution variant (model.py:260-270); both are printed in the result
line so README rows can be labeled (VERDICT r3 weak #2).
"""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import time

import numpy as np
import jax
import jax.numpy as jnp

from benchmarks.common import production_face, sync


def main(iters: int = 300, batch: int = 1, pyramid_mode: str = "downsample",
         segments: int = 1):
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from stylerenderer_tpu.eval.lpips import load_lpips
    from stylerenderer_tpu.inversion import ProjectorConfig, make_projector
    from stylerenderer_tpu.inversion.project import fit_segmented
    from stylerenderer_tpu.models import GeneratorWithMap

    size, latent = 256, 512
    gen = GeneratorWithMap(size, latent, 8, dtype=jnp.bfloat16,
                           pyramid_mode=pyramid_mode)
    face, tri, vert, norm = production_face(batch)
    z0 = jnp.zeros((batch, latent))
    variables = jax.jit(gen.init)(
        {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)},
        [z0], (vert, norm, tri),
    )

    lpips_apply, lpips_params = load_lpips("vgg")
    lpips_fn = lambda a, b: lpips_apply(lpips_params, a, b)
    # 68 mesh landmark vertex ids (synthetic stand-in for the BFM landmark
    # table; cost is identical: a 68-row gather + projection per iter)
    nv = vert.shape[1]
    lmk_vidx = jnp.linspace(0, nv - 1, 68).astype(jnp.int32)

    cfg = ProjectorConfig(iters=iters, w_lpips=0.8, w_lmk=1e-3)
    project = jax.jit(
        make_projector(gen, variables["params"], face, tri, cfg,
                       lpips_fn=lpips_fn, lmk_vidx=lmk_vidx),
        static_argnames=("n_steps", "return_state"),
    )
    if segments > 1:
        # dispatch-length cap workaround (fit_segmented docstring): same
        # trajectory, `segments` scans of iters/segments steps each
        run = lambda key: fit_segmented(project, key, target, target_lmk,
                                        iters=iters, segments=segments)
    else:
        run = lambda key: project(key, target, target_lmk)
    target = jnp.zeros((batch, size, size, 3))
    target_lmk = jnp.full((batch, 68, 2), size / 2.0)

    out = run(jax.random.PRNGKey(3))
    sync(out["render"])
    t0 = time.time()
    out = run(jax.random.PRNGKey(4))
    sync(out["render"])
    dt = time.time() - t0
    for k, val in sorted(out["losses"].items()):
        print(f"  final {k}: {float(val):.6g}", flush=True)
    hist = np.asarray(out["loss_history"])
    bad = np.flatnonzero(~np.isfinite(hist))
    if bad.size:
        print(f"  loss went non-finite at iter {bad[0]} / {hist.size}",
              flush=True)
    assert np.isfinite(float(out["losses"]["lpips"]))
    assert np.isfinite(float(out["losses"]["lmk"]))
    seg = f", {segments} host segments" if segments > 1 else ""
    print(f"{iters}-iter inversion (LPIPS+lmk), batch {batch}, "
          f"pyramid_mode={pyramid_mode}{seg}: {dt / batch:.2f} s/face "
          f"({dt / iters * 1e3:.1f} ms/iter for the batch)")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 300,
         int(sys.argv[2]) if len(sys.argv) > 2 else 1,
         sys.argv[3] if len(sys.argv) > 3 else "downsample",
         int(sys.argv[4]) if len(sys.argv) > 4 else 1)
