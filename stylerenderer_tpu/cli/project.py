"""Face-reconstruction CLI: invert the renderer against photos.

python -m stylerenderer_tpu.cli.project PHOTO.png [PHOTO2.png ...] \
    --ckpt CKPT_DIR --iters 300 [--size 256 --bfm BFM.mat --out recon/]

Implements the paper's reconstruction pipeline end-to-end: load aligned
photo(s) -> optimize (w+, 3DMM params, pose) on device -> save the render,
the recovered normal map, and the fitted mesh (.obj).
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description="render inverting (reconstruction)")
    p.add_argument("photos", nargs="+", help="aligned face photos")
    p.add_argument("--ckpt", type=str, default="", help="orbax checkpoint dir")
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--latent", type=int, default=512)
    p.add_argument("--n_mlp", type=int, default=8)
    p.add_argument("--channel_multiplier", type=int, default=2)
    p.add_argument("--bfm", type=str, default="")
    p.add_argument("--iters", type=int, default=300)
    p.add_argument("--lr", type=float, default=0.05)
    p.add_argument("--w_lpips", type=float, default=0.0,
                   help="LPIPS weight (needs vgg weights for true LPIPS)")
    p.add_argument("--vgg_weights", type=str, default="")
    p.add_argument("--out", type=str, default="recon")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--segments", type=int, default=1,
                   help="split the fit into this many host dispatches "
                        "(backends with a bounded single-dispatch wall "
                        "clock; identical trajectory)")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from stylerenderer_tpu.face3d import load_bfm, synthetic_face, save_obj
    from stylerenderer_tpu.inversion import ProjectorConfig, make_projector_jit
    from stylerenderer_tpu.models import GeneratorWithMap
    from stylerenderer_tpu.utils.image import save_image_grid

    os.makedirs(args.out, exist_ok=True)
    gen = GeneratorWithMap(args.size, args.latent, args.n_mlp,
                           channel_multiplier=args.channel_multiplier)
    face, tri = load_bfm(args.bfm) if args.bfm else synthetic_face(48, 96, 80, 29)

    # params
    from stylerenderer_tpu.face3d import mesh_point_normal

    x0 = face.random_input(jax.random.PRNGKey(0), 1)
    v0 = face(x0)
    n0 = mesh_point_normal(v0, tri)
    z0 = jnp.zeros((1, args.latent))
    variables = jax.jit(gen.init)(
        {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)},
        [z0], (v0, n0, tri),
    )
    params = variables["params"]
    if args.ckpt:
        from stylerenderer_tpu.utils.checkpoint import load_params_only

        state, _ = load_params_only(args.ckpt)
        params = jax.tree_util.tree_map(
            jnp.asarray, state.get("g_ema", state.get("g_params"))
        )

    lpips = None
    if args.w_lpips > 0:
        from stylerenderer_tpu.eval import load_lpips

        lpips = load_lpips("vgg", backbone_weights=args.vgg_weights or None)

    cfg = ProjectorConfig(iters=args.iters, lr=args.lr, w_lpips=args.w_lpips)
    # params as jit args, not closures: captured trees are embedded into the
    # lowered HLO and can exceed compile-service request limits at 256px
    project = make_projector_jit(gen, face, tri, cfg, lpips=lpips)

    # load targets
    imgs = []
    for path in args.photos:
        img = Image.open(path).convert("RGB").resize((args.size, args.size))
        imgs.append(np.asarray(img, np.float32) / 127.5 - 1.0)
    target = jnp.asarray(np.stack(imgs))

    out = project(params, jax.random.PRNGKey(args.seed), target,
                  segments=args.segments)
    hist = np.asarray(out["loss_history"])
    print(f"loss: {hist[0]:.4f} -> {hist[-1]:.4f} over {args.iters} iters")
    save_image_grid(os.path.join(args.out, "render.png"), np.asarray(out["render"]))
    save_image_grid(os.path.join(args.out, "target.png"), np.asarray(target))
    for i in range(len(imgs)):
        save_obj(
            os.path.join(args.out, f"mesh_{i:03d}.obj"),
            np.asarray(out["vertices"][i]), np.asarray(tri),
        )
    np.savez(
        os.path.join(args.out, "fit.npz"),
        w_plus=np.asarray(out["w_plus"]),
        face_params=np.asarray(out["face_params"]),
        rvec=np.asarray(out["rvec"]),
        tvec=np.asarray(out["tvec"]),
        log_scale=np.asarray(out["log_scale"]),
        loss_history=hist,
    )
    print(f"wrote render/target/meshes/fit.npz -> {args.out}")


if __name__ == "__main__":
    main()
