"""Generation CLI (reference ``generate.py``): sample image grids from a
trained (or randomly-initialized) generator.

python -m stylerenderer_tpu.cli.generate --size 64 --sample 1 --pics 1 \
    [--ckpt DIR] [--truncation 0.7] [--with_map] [--bfm PATH] [--out DIR]

Loads ``g_ema`` (falling back to ``g_params``) from an orbax checkpoint; with
``--with_map`` renders through the GAR conditioned on a 3DMM mesh (loaded
from --bfm, or the synthetic stand-in).
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def build_argparser():
    p = argparse.ArgumentParser(description="StyleRenderer-TPU generator")
    p.add_argument("--size", type=int, default=1024)
    p.add_argument("--latent", type=int, default=512)
    p.add_argument("--n_mlp", type=int, default=8)
    p.add_argument("--channel_multiplier", type=int, default=2)
    p.add_argument("--sample", type=int, default=1, help="faces per grid")
    p.add_argument("--pics", type=int, default=1, help="number of grids")
    p.add_argument("--ckpt", type=str, default="", help="orbax checkpoint dir")
    p.add_argument("--truncation", type=float, default=1.0)
    p.add_argument("--truncation_mean", type=int, default=4096)
    p.add_argument("--with_map", action="store_true",
                   help="use the GAR (GeneratorWithMap) with a mesh condition")
    p.add_argument("--bfm", type=str, default="", help="BFM .mat (else synthetic)")
    p.add_argument("--out", type=str, default="sample")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--save_normals", action="store_true")
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)
    import jax
    import jax.numpy as jnp

    from stylerenderer_tpu.face3d import (
        load_bfm, mesh_point_normal, random_apply_pose3D, synthetic_face,
    )
    from stylerenderer_tpu.models import Generator, GeneratorWithMap
    from stylerenderer_tpu.utils.image import save_image_grid

    os.makedirs(args.out, exist_ok=True)
    rng = jax.random.PRNGKey(args.seed)

    if args.with_map:
        gen = GeneratorWithMap(args.size, args.latent, args.n_mlp,
                               channel_multiplier=args.channel_multiplier)
        if args.bfm:
            face, tri = load_bfm(args.bfm)
        else:
            face, tri = synthetic_face(48, 96, 80, 29)
    else:
        gen = Generator(args.size, args.latent, args.n_mlp,
                        channel_multiplier=args.channel_multiplier)
        face = tri = None

    def sample_mesh(key, batch):
        k1, k2 = jax.random.split(key)
        x = face.random_input(k1, batch)
        vert = random_apply_pose3D(k2, face(x))
        norm = mesh_point_normal(vert, tri)
        return vert, norm

    # init / load params
    rng, kinit, knoise = jax.random.split(rng, 3)
    z0 = jnp.zeros((args.sample, args.latent))
    if args.with_map:
        vert0, norm0 = sample_mesh(jax.random.PRNGKey(0), args.sample)
        variables = gen.init({"params": kinit, "noise": knoise}, [z0],
                             (vert0, norm0, tri))
    else:
        variables = gen.init({"params": kinit, "noise": knoise}, [z0])
    params = variables["params"]
    if args.ckpt:
        from stylerenderer_tpu.utils.checkpoint import load_params_only

        state, _cfg = load_params_only(args.ckpt)
        loaded = state.get("g_ema", state.get("g_params"))
        if loaded is None:
            raise KeyError("checkpoint has neither g_ema nor g_params")
        params = jax.tree_util.tree_map(jnp.asarray, loaded)

    trunc_latent = None
    if args.truncation < 1:
        rng, k = jax.random.split(rng)
        trunc_latent = gen.apply(
            {"params": params}, k, args.truncation_mean, method=gen.mean_latent
        )

    @jax.jit
    def render(z, vert, norm, key):
        out = gen.apply(
            {"params": params}, [z], (vert, norm, tri),
            truncation=args.truncation if args.truncation < 1 else None,
            truncation_latent=trunc_latent, return_normals=True,
            rngs={"noise": key},
        )
        return out[0], out[2]

    @jax.jit
    def render_nomap(z, key):
        img, _ = gen.apply(
            {"params": params}, [z],
            truncation=args.truncation if args.truncation < 1 else None,
            truncation_latent=trunc_latent, rngs={"noise": key},
        )
        return img

    for i in range(args.pics):
        rng, kz, km, kn = jax.random.split(rng, 4)
        z = jax.random.normal(kz, (args.sample, args.latent))
        if args.with_map:
            vert, norm = sample_mesh(km, args.sample)
            img, norms = render(z, vert, norm, kn)
            if args.save_normals:
                save_image_grid(
                    os.path.join(args.out, f"{i:06d}_norm.png"), np.asarray(norms[-1])
                )
        else:
            img = render_nomap(z, kn)
        path = save_image_grid(os.path.join(args.out, f"{i:06d}.png"), np.asarray(img))
        print(path)


if __name__ == "__main__":
    main()
