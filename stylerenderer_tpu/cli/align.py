"""Face alignment CLI (reference ``utils_face.py`` __main__):
python -m stylerenderer_tpu.cli.align PHOTOS/ --out ALIGNED/ \
    [--lmk_dir LMKS/ | --dlib PREDICTOR.dat] [--size 256 --bfm BFM.mat]"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description="align faces to the canonical pose")
    p.add_argument("path", type=str, help="input photo folder")
    p.add_argument("--out", type=str, required=True)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--bfm", type=str, default="")
    p.add_argument("--lmk_dir", type=str, default="",
                   help="precomputed landmark .txt files")
    p.add_argument("--dlib", type=str, default="",
                   help="dlib 68-point shape predictor path")
    p.add_argument("--lmk_vidx", type=str, default="",
                   help="comma-separated landmark vertex ids of the face model")
    args = p.parse_args(argv)

    import numpy as np

    from stylerenderer_tpu.face3d import load_bfm, synthetic_face
    from stylerenderer_tpu.face3d.alignment import (
        LandmarksDetectorDlib, LandmarksReader, align_dataset,
    )

    if args.lmk_dir:
        detector = LandmarksReader(args.lmk_dir)
    elif args.dlib:
        detector = LandmarksDetectorDlib(args.dlib)
    else:
        raise SystemExit("need --lmk_dir or --dlib for landmark detection")

    face, tri = load_bfm(args.bfm) if args.bfm else synthetic_face(48, 96, 80, 29)
    if args.lmk_vidx:
        lmk_vidx = np.asarray([int(i) for i in args.lmk_vidx.split(",")])
    else:
        # spread over the mesh as a fallback (real use: BFM landmark ids)
        nv = face.mean.shape[0] // 3
        lmk_vidx = np.linspace(0, nv - 1, 68).astype(np.int64)

    n = align_dataset(args.path, args.out, detector, face, tri, lmk_vidx,
                      args.size)
    print(f"aligned {n} photos -> {args.out}")


if __name__ == "__main__":
    main()
