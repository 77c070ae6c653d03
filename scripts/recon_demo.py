"""Batch face-reconstruction demonstration (BASELINE config #4, VERDICT r2
next-step #4): invert the trained GAR against a batch of "photos".

The photos are renders from the committed ``train_demo`` 64px checkpoint
with KNOWN ground-truth (w+, 3DMM params, pose) — so besides image-space
reconstruction quality (pixel MSE / PSNR, landmark error) the script also
reports geometry recovery (vertex RMSE against the ground-truth posed
mesh), which no real-photo benchmark could measure. Pipeline per face:
sample gt -> render target -> project (pixel + landmark + prior over
w+, 3DMM params, pose; ``inversion/project.py``) -> metrics + grids.

Artifacts -> recon_demo/{metrics.json, grid_*.png}.

python scripts/recon_demo.py [--faces 96] [--iters 300] [--batch 16]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

OUT = os.path.join(os.path.dirname(__file__), "..", "recon_demo")
DEMO = os.path.join(os.path.dirname(__file__), "..", "train_demo")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--faces", type=int, default=96)
    p.add_argument("--iters", type=int, default=300)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--seed", type=int, default=11)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from stylerenderer_tpu.face3d import mesh_point_normal, synthetic_face
    from stylerenderer_tpu.inversion import ProjectorConfig, make_projector
    from stylerenderer_tpu.inversion.project import _apply_pose
    from stylerenderer_tpu.train import init_train_state, make_models
    from stylerenderer_tpu.utils.checkpoint import load_checkpoint
    from stylerenderer_tpu.utils.config import TrainConfig

    os.makedirs(OUT, exist_ok=True)

    # the train_demo run's exact config (scripts/train_demo.py)
    cfg = TrainConfig(size=64, batch=8, compute_dtype="bfloat16")
    face, tri = synthetic_face(48, 96, 80, 29)
    gen, _disc = make_models(cfg)
    x0 = face.random_input(jax.random.PRNGKey(0), 2)
    v0 = face(x0)
    n0 = mesh_point_normal(v0, tri)
    template = init_train_state(cfg, jax.random.PRNGKey(1), (v0, n0, tri))
    state, _ = load_checkpoint(
        os.path.join(DEMO, "checkpoint"), template
    )
    g_params = jax.device_get(state.g_ema)
    del state, template

    nv = v0.shape[1]
    lmk_vidx = jnp.linspace(0, nv - 1, 68).astype(jnp.int32)
    size = cfg.size

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

    pcfg = ProjectorConfig(iters=args.iters, w_lpips=0.0, w_lmk=1e-3)
    project = jax.jit(
        make_projector(gen, g_params, face, tri, pcfg, lmk_vidx=lmk_vidx)
    )

    metrics = {"pixel_mse": [], "psnr": [], "lmk_err_px": [],
               "vertex_rmse": [], "s_per_face": []}
    grids = []
    rng = jax.random.PRNGKey(args.seed)
    n_batches = -(-args.faces // args.batch)
    for bi in range(n_batches):
        rng, k1, k2 = jax.random.split(rng, 3)
        target, vert_gt = make_targets(k1)
        target_lmk = project_lmk(vert_gt)
        np.asarray(target).ravel()[:1]  # sync (readback; see benchmarks)
        t0 = time.time()
        out = project(k2, target, target_lmk)
        render = np.asarray(out["render"], np.float32)
        dt = time.time() - t0
        hist = np.asarray(out["loss_history"])
        assert np.isfinite(hist).all(), f"non-finite at batch {bi}"
        tnp = np.asarray(target)
        mse = ((render - tnp) ** 2).mean(axis=(1, 2, 3))
        psnr = 10 * np.log10(4.0 / np.maximum(mse, 1e-12))  # range [-1,1]
        lmk_pred = np.asarray(project_lmk(out["vertices"]))
        lmk_err = np.linalg.norm(
            lmk_pred - np.asarray(target_lmk), axis=-1
        ).mean(axis=-1)
        vrmse = np.sqrt(
            ((np.asarray(out["vertices"]) - np.asarray(vert_gt)) ** 2)
            .mean(axis=(1, 2))
        )
        metrics["pixel_mse"] += mse.tolist()
        metrics["psnr"] += psnr.tolist()
        metrics["lmk_err_px"] += lmk_err.tolist()
        metrics["vertex_rmse"] += vrmse.tolist()
        metrics["s_per_face"].append(dt / args.batch)
        if bi < 2:
            grids.append((tnp, render))
        print(f"batch {bi + 1}/{n_batches}: {dt / args.batch:.2f} s/face, "
              f"mse {mse.mean():.4f}, psnr {psnr.mean():.1f} dB, "
              f"lmk {lmk_err.mean():.2f} px, vrmse {vrmse.mean():.4f}",
              flush=True)

    def stats(a):
        a = np.asarray(a, np.float64)
        return {"mean": float(a.mean()), "median": float(np.median(a)),
                "p10": float(np.percentile(a, 10)),
                "p90": float(np.percentile(a, 90))}

    summary = {k: stats(v) for k, v in metrics.items()}
    summary["faces"] = len(metrics["pixel_mse"])
    summary["iters"] = args.iters
    summary["config"] = "pixel+landmark+prior over (w+, 3DMM, pose), 64px"
    with open(os.path.join(OUT, "metrics.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary, indent=1))

    # target/reconstruction grids
    from PIL import Image

    for gi, (tnp, render) in enumerate(grids):
        B = tnp.shape[0]
        cols = min(B, 8)
        rows_n = 2 * -(-B // cols)
        s = tnp.shape[1]
        canvas = np.ones((rows_n * s, cols * s, 3), np.float32)
        for i in range(B):
            r, c = divmod(i, cols)
            canvas[2 * r * s:(2 * r + 1) * s, c * s:(c + 1) * s] = tnp[i]
            canvas[(2 * r + 1) * s:(2 * r + 2) * s, c * s:(c + 1) * s] = \
                render[i]
        img = ((np.clip(canvas, -1, 1) + 1) * 127.5).astype(np.uint8)
        Image.fromarray(img).save(
            os.path.join(OUT, f"grid_{gi}.png")
        )
    print(f"artifacts -> {OUT}")


if __name__ == "__main__":
    main()
