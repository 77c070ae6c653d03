"""Training CLI (reference ``train.py`` __main__): adversarial training of
the GAR with R1 + path-length regularization, ADA, EMA, checkpoints, and
periodic sample grids.

python -m stylerenderer_tpu.cli.train DATA.srpack [--size 256 --batch 16 ...]

Data-parallel over every visible device via a ``Mesh('data')`` (SPMD; the
reference's torch.distributed launcher disappears — one process, one jitted
program, compiler-inserted collectives).
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def build_argparser():
    p = argparse.ArgumentParser(description="StyleRenderer-TPU trainer")
    p.add_argument("path", type=str, help="SRPack shard or image folder")
    p.add_argument("--iter", type=int, default=800_000)
    p.add_argument("--bfm", type=str, default="", help="BFM .mat (else synthetic)")
    p.add_argument("--batch", type=int, default=16, help="global batch size")
    p.add_argument("--n_sample", type=int, default=64)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--latent", type=int, default=512)
    p.add_argument("--n_mlp", type=int, default=8)
    p.add_argument("--r1", type=float, default=10.0)
    p.add_argument("--path_regularize", type=float, default=2.0)
    p.add_argument("--path_batch_shrink", type=int, default=2)
    p.add_argument("--d_reg_every", type=int, default=16)
    p.add_argument("--g_reg_every", type=int, default=4)
    p.add_argument("--mixing", type=float, default=0.9)
    p.add_argument("--ckpt", type=str, default="", help="resume checkpoint dir")
    p.add_argument("--lr", type=float, default=0.002)
    p.add_argument("--channel_multiplier", type=int, default=2)
    p.add_argument("--wandb", action="store_true")
    p.add_argument("--augment", action="store_true")
    p.add_argument("--augment_p", type=float, default=0.0)
    p.add_argument("--ada_target", type=float, default=0.6)
    p.add_argument("--ada_length", type=int, default=500_000)
    p.add_argument("--ada_every", type=int, default=256)
    p.add_argument("--seed", type=int, default=-1)
    p.add_argument("--out_dir", type=str, default=".")
    p.add_argument("--ckpt_every", type=int, default=10_000)
    p.add_argument("--ckpt_keep", type=int, default=5,
                   help="checkpoints retained (orbax max_to_keep)")
    p.add_argument("--sample_every", type=int, default=100)
    p.add_argument("--log_every", type=int, default=10)
    p.add_argument("--compute_dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--pyramid_mode", type=str, default="each",
                   choices=["each", "downsample"])
    # perceptual supervisors (reference thirdparty nets, train.py:502-528)
    p.add_argument("--sfs", action="store_true",
                   help="shape-from-shading normal-consistency loss")
    p.add_argument("--lmk", action="store_true",
                   help="landmark-consistency loss on geometry-paired batches")
    p.add_argument("--feat", action="store_true",
                   help="identity-consistency loss on shape-paired batches")
    p.add_argument("--profile_steps", type=int, default=0,
                   help="capture a jax.profiler trace for the first N steps")
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)
    import time

    import jax
    import jax.numpy as jnp

    from stylerenderer_tpu.data import (
        ImageFolderDataset, SRPackDataset, prefetch_batches,
    )
    from stylerenderer_tpu.face3d import (
        load_bfm, mesh_point_normal, random_apply_pose3D, synthetic_face,
    )
    from stylerenderer_tpu.face3d.augment import ada_augment
    from stylerenderer_tpu.parallel import make_mesh, replicate, shard_batch
    from stylerenderer_tpu.train import (
        init_train_state, make_models, make_train_step,
    )
    from stylerenderer_tpu.utils.checkpoint import (
        latest_step, load_checkpoint, save_checkpoint,
    )
    from stylerenderer_tpu.utils.config import TrainConfig
    from stylerenderer_tpu.utils.image import save_image_grid
    from stylerenderer_tpu.utils.logging import MetricsLogger, StepTimer

    seed = args.seed if args.seed >= 0 else int(time.time())
    cfg = TrainConfig(
        size=args.size, latent=args.latent, n_mlp=args.n_mlp,
        channel_multiplier=args.channel_multiplier, iter=args.iter,
        batch=args.batch, lr=args.lr, r1=args.r1,
        path_regularize=args.path_regularize,
        path_batch_shrink=args.path_batch_shrink,
        d_reg_every=args.d_reg_every, g_reg_every=args.g_reg_every,
        mixing=args.mixing, augment=args.augment, augment_p=args.augment_p,
        ada_target=args.ada_target, ada_length=args.ada_length,
        ada_every=args.ada_every, n_sample=args.n_sample, seed=seed,
        compute_dtype=args.compute_dtype, pyramid_mode=args.pyramid_mode,
    )

    # data
    if os.path.isdir(args.path):
        dataset = ImageFolderDataset(args.path, resolution=cfg.size)
    else:
        dataset = SRPackDataset(args.path, resolution=cfg.size)
    print(f"dataset: {len(dataset)} images at {cfg.size}px")
    loader = prefetch_batches(dataset, cfg.batch, seed=seed)

    # face model
    if args.bfm:
        face, tri = load_bfm(args.bfm)
    else:
        face, tri = synthetic_face(48, 96, 80, 29)

    gen, disc = make_models(cfg)
    rng = jax.random.PRNGKey(seed)
    rng, kinit, ksample = jax.random.split(rng, 3)
    x0 = face.random_input(jax.random.PRNGKey(0), 2)
    v0 = face(x0)
    n0 = mesh_point_normal(v0, tri)
    state = init_train_state(cfg, kinit, (v0, n0, tri))

    start_iter = 0
    ckpt_dir = os.path.join(args.out_dir, "checkpoint")
    if args.ckpt:
        state, cfg_loaded = load_checkpoint(args.ckpt, state)
        start_iter = int(state.step)
        print(f"resumed from {args.ckpt} at step {start_iter}")

    augment_fn = ada_augment if cfg.augment else None
    extra_heads = None
    if args.sfs or args.lmk or args.feat:
        from stylerenderer_tpu.supervisors import make_extra_heads

        extra_heads = make_extra_heads(
            jax.random.PRNGKey(cfg.seed + 1), sfs=args.sfs, lmk=args.lmk,
            feat=args.feat, image_size=cfg.size,
        )
    step_fn = jax.jit(
        make_train_step(cfg, gen, disc, face, tri, augment_fn, extra_heads)
    )

    # multi-device SPMD
    mesh = make_mesh()
    n_dev = len(mesh.devices.reshape(-1))
    if cfg.batch % n_dev != 0:
        raise ValueError(f"batch {cfg.batch} not divisible by {n_dev} devices")
    state = replicate(mesh, state)
    # overlap H2D transfer with the device step
    from stylerenderer_tpu.data import device_prefetch
    from stylerenderer_tpu.parallel import batch_sharding

    loader = device_prefetch(loader, depth=2, sharding=batch_sharding(mesh))

    # fixed evaluation set (train.py:225-230)
    k1, k2, k3 = jax.random.split(ksample, 3)
    sample_z = jax.random.normal(k1, (cfg.n_sample, cfg.latent))
    sample_x = face.random_input(k2, cfg.n_sample)
    sample_v = random_apply_pose3D(k3, face(sample_x))
    sample_n = mesh_point_normal(sample_v, tri)

    @jax.jit
    def render_samples(g_ema):
        img, _, norms = gen.apply(
            {"params": g_ema}, [sample_z], (sample_v, sample_n, tri),
            return_normals=True, rngs={"noise": jax.random.PRNGKey(0)},
        )
        return img, norms[-1]

    logger = MetricsLogger(os.path.join(args.out_dir, "logs"), args.wandb)
    timer = StepTimer()
    os.makedirs(os.path.join(args.out_dir, "sample"), exist_ok=True)

    from stylerenderer_tpu.utils.guards import TrainGuard

    def restore_latest():
        if latest_step(ckpt_dir) is None:
            raise RuntimeError(
                "non-finite training metrics and no checkpoint to restore from"
            )
        s, _ = load_checkpoint(ckpt_dir, jax.device_get(state))
        print("guard: restored from latest checkpoint")
        return replicate(mesh, s)

    guard = TrainGuard(restore_fn=restore_latest)

    with mesh:
        for i in range(start_iter, cfg.iter):
            if args.profile_steps and i == start_iter + 1:
                from stylerenderer_tpu.utils.logging import start_profiler_trace

                start_profiler_trace(os.path.join(args.out_dir, "profile"))
            real = next(loader)
            # per-step NaN protection happens INSIDE the jitted step (the
            # finite screen discards non-finite updates on-device); the host
            # guard below only escalates to checkpoint restore.
            state, metrics = step_fn(state, real)
            timer.tick()
            if args.profile_steps and i == start_iter + args.profile_steps:
                from stylerenderer_tpu.utils.logging import stop_profiler_trace

                jax.block_until_ready(state.g_params)
                stop_profiler_trace()
            if i % args.log_every == 0:
                m = {k: float(v) for k, v in metrics.items()}
                state = guard.check(i, state, m, state)
                m["imgs_per_sec"] = timer.images_per_sec(cfg.batch)
                logger.log(i, m)
                if i % (args.log_every * 10) == 0:
                    print(
                        f"step {i}  d {m['d']:.4f}  g {m['g']:.4f}  "
                        f"r1 {m['r1']:.4f}  path {m['path']:.4f}  "
                        f"ada {m['ada_p']:.3f}  {m['imgs_per_sec']:.1f} img/s"
                    )
            if (i + 1) % args.sample_every == 0:
                img, norms = render_samples(state.g_ema)
                save_image_grid(
                    os.path.join(args.out_dir, "sample", f"{i:06d}.png"),
                    np.asarray(img),
                )
                save_image_grid(
                    os.path.join(args.out_dir, "sample", f"{i:06d}_norm.png"),
                    np.asarray(norms),
                )
            if (i + 1) % args.ckpt_every == 0 or (i + 1) == cfg.iter:
                save_checkpoint(ckpt_dir, i + 1, jax.device_get(state), cfg,
                                max_to_keep=args.ckpt_keep)
    logger.close()


if __name__ == "__main__":
    main()
