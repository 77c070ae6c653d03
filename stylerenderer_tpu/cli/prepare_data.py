"""Data prep CLI (reference ``prepare_data.py``):
python -m stylerenderer_tpu.cli.prepare_data --out data.srpack \
    --size 128,256,512,1024 --n_worker 8 [--codec raw|jpeg] PATH"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description="images -> multi-resolution SRPack")
    p.add_argument("path", type=str, help="input image folder")
    p.add_argument("--out", type=str, required=True, help="output .srpack path")
    p.add_argument("--size", type=str, default="128,256,512,1024")
    p.add_argument("--n_worker", type=int, default=8)
    p.add_argument("--codec", type=str, default="raw", choices=["raw", "jpeg"])
    p.add_argument("--resample", type=str, default="lanczos",
                   choices=["lanczos", "bilinear", "bicubic", "box", "nearest"])
    p.add_argument("--limit", type=int, default=0)
    args = p.parse_args(argv)

    from stylerenderer_tpu.data import prepare

    sizes = [int(s) for s in args.size.split(",")]
    n = prepare(args.path, args.out, sizes, args.n_worker, args.codec,
                args.resample, args.limit or None)
    print(f"wrote {n} items x sizes {sizes} -> {args.out}")


if __name__ == "__main__":
    main()
