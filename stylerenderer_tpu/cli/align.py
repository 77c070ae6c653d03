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
                   help="precomputed landmark .txt files (one per image)")
    p.add_argument("--lmk_manifest", type=str, default="",
                   help="single manifest txt: 'name.png x0 y0 x1 y1 ...' lines")
    p.add_argument("--dlib", type=str, default="",
                   help="dlib 68-point shape predictor path")
    p.add_argument("--exec", dest="exec_path", type=str, default="",
                   help="external landmark-detector binary (utils_face.py:73-92)")
    p.add_argument("--lmk_vidx", type=str, default="",
                   help="comma-separated landmark vertex ids of the face model")
    p.add_argument("--render_ref", action="store_true",
                   help="build the canonical reference by rasterizing the "
                        "textured mean face and detecting landmarks on the "
                        "render (needs --bfm with a 'tex' field)")
    args = p.parse_args(argv)

    import numpy as np

    from stylerenderer_tpu.face3d import load_bfm, synthetic_face
    from stylerenderer_tpu.face3d.alignment import (
        LandmarksDetectorDlib, LandmarksDetectorExec, LandmarksManifestReader,
        LandmarksReader, align_dataset,
    )
    from stylerenderer_tpu.face3d.io import load_bfm_texture

    if args.lmk_dir:
        detector = LandmarksReader(args.lmk_dir)
    elif args.lmk_manifest:
        detector = LandmarksManifestReader(args.lmk_manifest)
    elif args.dlib:
        detector = LandmarksDetectorDlib(args.dlib)
    elif args.exec_path:
        detector = LandmarksDetectorExec(args.exec_path)
    else:
        raise SystemExit(
            "need --lmk_dir / --lmk_manifest / --dlib / --exec for landmarks"
        )

    face, tri = load_bfm(args.bfm) if args.bfm else synthetic_face(48, 96, 80, 29)
    tex = load_bfm_texture(args.bfm) if (args.render_ref and args.bfm) else None
    if args.render_ref and tex is None:
        raise SystemExit("--render_ref needs a --bfm .mat with a 'tex' field")
    if args.lmk_vidx:
        lmk_vidx = np.asarray([int(i) for i in args.lmk_vidx.split(",")])
    elif tex is None:
        # spread over the mesh as a fallback (real use: BFM landmark ids or
        # --render_ref)
        nv = face.mean.shape[0] // 3
        lmk_vidx = np.linspace(0, nv - 1, 68).astype(np.int64)
    else:
        lmk_vidx = None

    n = align_dataset(args.path, args.out, detector, face, tri, lmk_vidx,
                      args.size, tex=tex)
    print(f"aligned {n} photos -> {args.out}")


if __name__ == "__main__":
    main()
