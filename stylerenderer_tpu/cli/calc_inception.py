"""Precompute real-data inception statistics (reference ``calc_inception.py``):
python -m stylerenderer_tpu.cli.calc_inception --size 256 --batch 64 \
    --n_sample 50000 --out inception_stats.pkl DATA"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description="inception stats for FID")
    p.add_argument("path", type=str, help="SRPack shard or image folder")
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--n_sample", type=int, default=50_000)
    p.add_argument("--out", type=str, default="")
    p.add_argument("--inception_weights", type=str, default="",
                   help="torch FID-inception state dict (optional)")
    args = p.parse_args(argv)

    import os

    import jax
    import jax.numpy as jnp

    from stylerenderer_tpu.data import (
        ImageFolderDataset, SRPackDataset, prefetch_batches,
    )
    from stylerenderer_tpu.eval import (
        extract_features_from_dataset, feature_stats, load_patched_inception_v3,
        save_stats,
    )

    if os.path.isdir(args.path):
        ds = ImageFolderDataset(args.path, resolution=args.size)
    else:
        ds = SRPackDataset(args.path, resolution=args.size)
    n = min(args.n_sample, len(ds))
    model, params = load_patched_inception_v3(args.inception_weights or None)
    apply_fn = jax.jit(lambda x: model.apply({"params": params}, x))
    it = prefetch_batches(ds, args.batch, train=False, drop_last=True)
    feats = extract_features_from_dataset(it, apply_fn, n)
    mu, cov = feature_stats(feats)
    out = args.out or f"inception_{os.path.basename(args.path)}.pkl"
    save_stats(out, mu, cov, meta={"size": args.size, "n": len(feats),
                                   "pretrained": bool(args.inception_weights)})
    print(f"wrote stats for {len(feats)} images -> {out}")


if __name__ == "__main__":
    main()
