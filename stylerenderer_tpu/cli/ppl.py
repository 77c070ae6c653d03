"""PPL CLI (reference ``ppl.py``): perceptual path length of a generator.

python -m stylerenderer_tpu.cli.ppl --ckpt CKPT_DIR [--space w|z \
    --sampling end|full --eps 1e-4 --crop --n_sample 5000 --batch 64]"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description="perceptual path length")
    p.add_argument("--ckpt", type=str, required=True)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--latent", type=int, default=512)
    p.add_argument("--n_mlp", type=int, default=8)
    p.add_argument("--channel_multiplier", type=int, default=2)
    p.add_argument("--space", choices=["z", "w"], default="w")
    p.add_argument("--sampling", choices=["end", "full"], default="end")
    p.add_argument("--eps", type=float, default=1e-4)
    p.add_argument("--crop", action="store_true")
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--n_sample", type=int, default=5_000)
    p.add_argument("--with_map", action="store_true")
    p.add_argument("--bfm", type=str, default="")
    p.add_argument("--vgg_weights", type=str, default="",
                   help="torchvision vgg16 state dict for true LPIPS")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from stylerenderer_tpu.eval import compute_ppl, load_lpips, make_ppl_sampler
    from stylerenderer_tpu.face3d import (
        load_bfm, mesh_point_normal, random_apply_pose3D, synthetic_face,
    )
    from stylerenderer_tpu.models import Generator, GeneratorWithMap
    from stylerenderer_tpu.utils.checkpoint import load_params_only

    state, _cfg = load_params_only(args.ckpt)
    params = state.get("g_ema", state.get("g_params"))
    params = jax.tree_util.tree_map(jnp.asarray, params)

    mesh = None
    if args.with_map:
        gen = GeneratorWithMap(args.size, args.latent, args.n_mlp,
                               channel_multiplier=args.channel_multiplier)
        face, tri = load_bfm(args.bfm) if args.bfm else synthetic_face(48, 96, 80, 29)
        k1, k2 = jax.random.split(jax.random.PRNGKey(1))
        x = face.random_input(k1, args.batch)
        vert = random_apply_pose3D(k2, face(x))
        norm = mesh_point_normal(vert, tri)
        mesh = (vert, norm, tri)
    else:
        gen = Generator(args.size, args.latent, args.n_mlp,
                        channel_multiplier=args.channel_multiplier)

    lpips_apply, lpips_params = load_lpips(
        "vgg", backbone_weights=args.vgg_weights or None
    )

    def map_fn(z):
        return gen.apply({"params": params}, z, method=gen.get_latent)

    def synth_fn(latents, input_is_latent):
        styles = [latents]
        kwargs = dict(input_is_latent=input_is_latent,
                      rngs={"noise": jax.random.PRNGKey(0)})
        if mesh is not None:
            out = gen.apply({"params": params}, styles, mesh, **kwargs)
        else:
            out = gen.apply({"params": params}, styles, **kwargs)
        return out[0]

    sampler = jax.jit(
        make_ppl_sampler(
            map_fn, synth_fn, lambda a, b: lpips_apply(lpips_params, a, b),
            args.latent, space=args.space, sampling=args.sampling,
            eps=args.eps, crop=args.crop,
        ),
        static_argnums=(1,),
    )
    ppl = compute_ppl(sampler, jax.random.PRNGKey(args.seed),
                      args.n_sample, args.batch)
    print(f"ppl: {ppl:.4f}")
    return ppl


if __name__ == "__main__":
    main()
