"""Production-resolution Render Inverting demonstration (VERDICT r3 #3 + #6):
the paper's actual method — REGRESSOR-INITIALIZED inversion — composed and
measured against the 256px train_demo256 checkpoint.

Pipeline:
  1. load the g_ema checkpoint from train_demo256/ (the 256², batch-16 run);
  2. train the Regressor encoder self-supervisedly on the generator's own
     renders (train/regressor.py — z -> w -> render -> regress w back);
  3. invert N target "photos" (renders with KNOWN w+/3DMM/pose ground truth)
     under four configs: {mean-latent, Regressor} init x {short, full}
     iteration budgets, with pixel + LPIPS + landmark losses;
  4. artifacts -> recon_demo256/{metrics.json, regressor_loss.json,
     grid_*.png}: per-config pixel MSE / PSNR / landmark px / vertex RMSE /
     s-per-face — demonstrating that the encoder init reaches mean-init-300
     quality at a fraction of the iterations (the sanctioned route to the
     BASELINE <2 s/face point).

Ref: /root/reference/model.py:337-387 (the Regressor, dead code there);
paper pipeline "Render Inverting" (SURVEY.md §7 step 9).

python scripts/recon_demo256.py [--faces 32] [--batch 8] [--reg_steps 1500]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

OUT = os.path.join(os.path.dirname(__file__), "..", "recon_demo256")
DEMO = os.path.join(os.path.dirname(__file__), "..", "train_demo256")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--faces", type=int, default=32)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--reg_steps", type=int, default=1500)
    p.add_argument("--reg_batch", type=int, default=8)
    p.add_argument("--iters_short", type=int, default=100)
    p.add_argument("--iters_full", type=int, default=300)
    p.add_argument("--seed", type=int, default=13)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from stylerenderer_tpu.eval.lpips import load_lpips
    from stylerenderer_tpu.face3d import mesh_point_normal, synthetic_face
    from stylerenderer_tpu.inversion import ProjectorConfig, make_projector
    from stylerenderer_tpu.inversion.project import _apply_pose
    from stylerenderer_tpu.models import Regressor
    from stylerenderer_tpu.train import make_models
    from stylerenderer_tpu.train.regressor import (
        make_regressor_fn, make_regressor_trainer,
    )
    from stylerenderer_tpu.utils.checkpoint import load_params_only
    from stylerenderer_tpu.utils.config import TrainConfig

    os.makedirs(OUT, exist_ok=True)

    # the train_demo256 run's exact config (scripts/train_demo256.py).
    # load_params_only skips the template init — an EAGER 256px gen+disc
    # init costs tens of minutes on this backend (~15-20 ms/dispatch)
    cfg = TrainConfig(size=256, batch=16, compute_dtype="bfloat16")
    face, tri = synthetic_face(48, 96, 80, 29)
    gen, _disc = make_models(cfg)
    x0 = face.random_input(jax.random.PRNGKey(0), 2)
    v0 = face(x0)
    state, _ = load_params_only(os.path.join(DEMO, "checkpoint"))
    # numpy closure constants get EMBEDDED into the lowered HLO; at 256px
    # that blows past the remote-compile relay's request-size limit
    # (HTTP 413, measured round 5) — device arrays are passed as buffers
    g_params = jax.tree_util.tree_map(jnp.asarray, state["g_ema"])
    del state
    print("checkpoint loaded", flush=True)

    size = cfg.size
    nv = v0.shape[1]
    lmk_vidx = jnp.linspace(0, nv - 1, 68).astype(jnp.int32)

    # ---- stage 1: self-supervised Regressor training on the checkpoint ----
    reg = Regressor(size, cfg.latent, cfg.n_mlp, dtype=jnp.bfloat16)
    init_fn, step_fn = make_regressor_trainer(
        reg, gen, g_params, face, tri, batch=args.reg_batch, lr=1e-4,
    )
    rstate = init_fn(jax.random.PRNGKey(args.seed))
    step_fn = jax.jit(step_fn)
    reg_losses = []
    t0 = time.time()
    for i in range(args.reg_steps):
        rstate, m = step_fn(rstate)
        if i % 50 == 0 or i == args.reg_steps - 1:
            reg_losses.append([i, float(m["regressor_loss"])])
            if i % 250 == 0:
                print(f"regressor step {i}: loss {reg_losses[-1][1]:.4f}",
                      flush=True)
    print(f"regressor training: {args.reg_steps} steps in "
          f"{time.time() - t0:.0f}s", flush=True)
    with open(os.path.join(OUT, "regressor_loss.json"), "w") as f:
        json.dump({"steps_losses": reg_losses}, f)

    # the Regressor emits a pixel-normed direction; rescale to the mean
    # radius of real mapped latents so Adam starts at the right magnitude
    w_norm = float(jax.jit(lambda p, z: jnp.sqrt(jnp.mean(
        gen.apply({"params": p}, z, method=gen.get_latent) ** 2
    )))(g_params, jax.random.normal(jax.random.PRNGKey(17), (256, cfg.latent))))
    reg_params = rstate.params  # keep as device arrays (HLO-size, see above)
    regressor_fn = make_regressor_fn(reg, reg_params, w_norm)
    del rstate

    # ---- stage 2: targets with known ground truth ----
    def project_lmk(vert):
        lv = vert[:, lmk_vidx, :]
        px = (1 + lv[..., 0]) * size / 2 - 0.5
        py = (1 - lv[..., 1]) * size / 2 - 0.5
        return jnp.stack([px, py], -1)

    @jax.jit
    def make_targets(rng, B=args.batch):
        ks = jax.random.split(rng, 5)
        z = jax.random.normal(ks[0], (B, cfg.latent))
        x = face.random_input(ks[1], B)
        rvec = jax.random.normal(ks[2], (B, 3)) * 0.15
        tvec = jax.random.normal(ks[3], (B, 3)) * 0.05
        log_s = jax.random.normal(ks[4], (B, 1)) * 0.05
        vert = _apply_pose(face(x), rvec, tvec, log_s)
        norm = mesh_point_normal(vert, tri)
        noise = [jnp.zeros((1, 1, 1, 1))] * gen.num_layers
        img, _, _ = gen.apply(
            {"params": g_params}, [z], (vert, norm, tri), noise=noise
        )
        return jnp.clip(img.astype(jnp.float32), -1, 1), vert

    lpips_apply, lpips_params = load_lpips("vgg")

    # param trees are passed as JIT ARGUMENTS, not closures: captured
    # constants are embedded by value into the lowered HLO, and g_ema +
    # VGG16 + Regressor weights together exceed the remote-compile relay's
    # request-size limit (HTTP 413, measured round 5 — twice)
    def make_cfg_runner(iters, use_reg):
        pcfg = ProjectorConfig(iters=iters, w_lpips=0.8, w_lmk=1e-3)

        @jax.jit
        def run(gp, lp, rp, k, target, target_lmk):
            lfn = lambda a, b: lpips_apply(lp, a, b)
            rfn = None
            if use_reg:
                rfn = lambda img: reg.apply({"params": rp}, img) * w_norm
            project = make_projector(
                gen, gp, face, tri, pcfg, lpips_fn=lfn,
                lmk_vidx=lmk_vidx, regressor_fn=rfn,
            )
            return project(k, target, target_lmk)

        return lambda k, t, tl: run(g_params, lpips_params, reg_params,
                                    k, t, tl)

    configs = {}
    for iters in (args.iters_short, args.iters_full):
        configs[f"mean_init_{iters}"] = make_cfg_runner(iters, False)
        configs[f"regressor_init_{iters}"] = make_cfg_runner(iters, True)

    # ---- stage 3: batch inversion under each config ----
    results = {k: {"pixel_mse": [], "psnr": [], "lmk_err_px": [],
                   "vertex_rmse": [], "s_per_face": []} for k in configs}
    grids = {}
    rng = jax.random.PRNGKey(args.seed + 1)
    n_batches = -(-args.faces // args.batch)
    for bi in range(n_batches):
        rng, k1, k2 = jax.random.split(rng, 3)
        target, vert_gt = make_targets(k1)
        target_lmk = project_lmk(vert_gt)
        tnp = np.asarray(target)
        for name, project in configs.items():
            t0 = time.time()
            out = project(k2, target, target_lmk)
            render = np.asarray(out["render"], np.float32)
            dt = time.time() - t0
            hist = np.asarray(out["loss_history"])
            assert np.isfinite(hist).all(), f"non-finite: {name} batch {bi}"
            mse = ((render - tnp) ** 2).mean(axis=(1, 2, 3))
            psnr = 10 * np.log10(4.0 / np.maximum(mse, 1e-12))
            lmk_pred = np.asarray(project_lmk(out["vertices"]))
            lmk_err = np.linalg.norm(
                lmk_pred - np.asarray(target_lmk), axis=-1).mean(axis=-1)
            vrmse = np.sqrt(
                ((np.asarray(out["vertices"]) - np.asarray(vert_gt)) ** 2)
                .mean(axis=(1, 2)))
            r = results[name]
            r["pixel_mse"] += mse.tolist()
            r["psnr"] += psnr.tolist()
            r["lmk_err_px"] += lmk_err.tolist()
            r["vertex_rmse"] += vrmse.tolist()
            r["s_per_face"].append(dt / args.batch)
            print(f"b{bi + 1}/{n_batches} {name}: {dt / args.batch:.2f} "
                  f"s/face, psnr {psnr.mean():.1f}, lmk {lmk_err.mean():.2f}"
                  f" px, vrmse {vrmse.mean():.4f}", flush=True)
            if bi == 0:
                grids[name] = (tnp, render)

    def stats(a):
        a = np.asarray(a, np.float64)
        return {"mean": float(a.mean()), "median": float(np.median(a)),
                "p10": float(np.percentile(a, 10)),
                "p90": float(np.percentile(a, 90))}

    summary = {
        name: {k: stats(v) for k, v in r.items()}
        for name, r in results.items()
    }
    # steady-state s/face (first batch carries the compile)
    for name, r in results.items():
        tail = r["s_per_face"][1:] or r["s_per_face"]
        summary[name]["s_per_face_steady"] = stats(tail)
    summary["faces"] = args.faces
    summary["config"] = ("pixel+LPIPS+landmark+prior over (w+, 3DMM, pose), "
                         "256px, batch %d" % args.batch)
    summary["regressor"] = {
        "steps": args.reg_steps, "final_loss": reg_losses[-1][1],
        "w_norm_scale": w_norm,
    }
    with open(os.path.join(OUT, "metrics.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary, indent=1))

    from PIL import Image

    for name, (tnp, render) in grids.items():
        B = tnp.shape[0]
        cols = min(B, 8)
        rows_n = 2 * -(-B // cols)
        s = tnp.shape[1]
        canvas = np.ones((rows_n * s, cols * s, 3), np.float32)
        for i in range(B):
            rr, cc = divmod(i, cols)
            canvas[2 * rr * s:(2 * rr + 1) * s, cc * s:(cc + 1) * s] = tnp[i]
            canvas[(2 * rr + 1) * s:(2 * rr + 2) * s,
                   cc * s:(cc + 1) * s] = render[i]
        img = ((np.clip(canvas, -1, 1) + 1) * 127.5).astype(np.uint8)
        Image.fromarray(img).save(os.path.join(OUT, f"grid_{name}.png"))
    print(f"artifacts -> {OUT}")


if __name__ == "__main__":
    main()
