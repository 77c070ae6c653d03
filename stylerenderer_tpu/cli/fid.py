"""FID CLI (reference ``fid.py``): sample the generator, compare pool3 stats
against precomputed real stats.

python -m stylerenderer_tpu.cli.fid --ckpt CKPT_DIR --inception stats.pkl \
    [--n_sample 50000 --batch 64 --with_map]"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description="FID of a generator checkpoint")
    p.add_argument("--ckpt", type=str, required=True)
    p.add_argument("--inception", type=str, required=True, help="real stats .pkl")
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--latent", type=int, default=512)
    p.add_argument("--n_mlp", type=int, default=8)
    p.add_argument("--channel_multiplier", type=int, default=2)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--n_sample", type=int, default=50_000)
    p.add_argument("--with_map", action="store_true")
    p.add_argument("--bfm", type=str, default="")
    p.add_argument("--inception_weights", type=str, default="")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--step", type=int, default=-1,
                   help="checkpoint step (default: latest)")
    args = p.parse_args(argv)

    import functools

    import jax
    import jax.numpy as jnp

    from stylerenderer_tpu.eval import (
        compute_fid, extract_features_from_samples, load_patched_inception_v3,
        load_stats,
    )
    from stylerenderer_tpu.face3d import (
        load_bfm, mesh_point_normal, random_apply_pose3D, synthetic_face,
    )
    from stylerenderer_tpu.models import Generator, GeneratorWithMap
    from stylerenderer_tpu.utils.checkpoint import load_params_only

    state, _cfg = load_params_only(
        args.ckpt, step=None if args.step < 0 else args.step
    )
    params = state.get("g_ema", state.get("g_params"))
    params = jax.tree_util.tree_map(jnp.asarray, params)

    if args.with_map:
        gen = GeneratorWithMap(args.size, args.latent, args.n_mlp,
                               channel_multiplier=args.channel_multiplier)
        face, tri = load_bfm(args.bfm) if args.bfm else synthetic_face(48, 96, 80, 29)
    else:
        gen = Generator(args.size, args.latent, args.n_mlp,
                        channel_multiplier=args.channel_multiplier)

    model, inc_params = load_patched_inception_v3(args.inception_weights or None)
    inc_apply = jax.jit(lambda x: model.apply({"params": inc_params}, x))

    @functools.partial(jax.jit, static_argnums=(1,))
    def sample_fn(rng, batch):
        kz, km, kp, kn = jax.random.split(rng, 4)
        z = jax.random.normal(kz, (batch, args.latent))
        if args.with_map:
            x = face.random_input(km, batch)
            vert = random_apply_pose3D(kp, face(x))
            norm = mesh_point_normal(vert, tri)
            img, _, _ = gen.apply(
                {"params": params}, [z], (vert, norm, tri), rngs={"noise": kn}
            )
        else:
            img, _ = gen.apply({"params": params}, [z], rngs={"noise": kn})
        return img

    feats = extract_features_from_samples(
        sample_fn, inc_apply, args.n_sample, args.batch,
        jax.random.PRNGKey(args.seed),
    )
    real_mu, real_cov = load_stats(args.inception)
    fid = compute_fid(feats, real_mu, real_cov)
    print(f"fid: {fid:.4f}")
    return fid


if __name__ == "__main__":
    main()
