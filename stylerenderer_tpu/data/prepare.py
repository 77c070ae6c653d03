"""Dataset preparation: image folder -> multi-resolution SRPack shard.

The reference's ``prepare_data.py`` (images -> lmdb at several sizes, with a
key-overwrite bug that loses all but the last size — SURVEY.md §8; intended
semantics implemented here). Resize with PIL LANCZOS, workers via
multiprocessing, codec raw (decode-free feeding) or jpeg (quality 100).
"""

from __future__ import annotations

import io
import multiprocessing
import os
from functools import partial
from typing import Sequence

import numpy as np

from stylerenderer_tpu.data.dataset import IMG_EXTENSIONS
from stylerenderer_tpu.data.srpack import SRPackWriter

_RESAMPLE = {
    "lanczos": "LANCZOS",
    "bilinear": "BILINEAR",
    "bicubic": "BICUBIC",
    "box": "BOX",
    "nearest": "NEAREST",
}


def _load_and_resize(path: str, sizes: Sequence[int], codec: str, resample: str,
                     quality: int = 100):
    from PIL import Image

    rs = getattr(Image, _RESAMPLE.get(resample, "LANCZOS"))
    img = Image.open(path).convert("RGB")
    out = []
    for s in sizes:
        r = img.resize((s, s), rs)
        if codec == "raw":
            out.append(np.asarray(r, np.uint8))
        else:
            buf = io.BytesIO()
            r.save(buf, format="jpeg", quality=quality)
            out.append(buf.getvalue())
    return out


def list_images(root: str) -> list[str]:
    files = []
    for dirpath, _, names in os.walk(root):
        for n in names:
            if os.path.splitext(n)[1].lower() in IMG_EXTENSIONS:
                files.append(os.path.join(dirpath, n))
    files.sort()
    return files


def prepare(
    in_dir: str, out_path: str, sizes: Sequence[int] = (128, 256, 512, 1024),
    n_workers: int = 8, codec: str = "raw", resample: str = "lanczos",
    limit: int | None = None,
) -> int:
    """Build an SRPack from an image folder; returns the item count."""
    files = list_images(in_dir)
    if limit:
        files = files[:limit]
    if not files:
        raise ValueError(f"no images under {in_dir}")
    writer = SRPackWriter(out_path, sizes, codec)
    fn = partial(_load_and_resize, sizes=sizes, codec=codec, resample=resample)
    if n_workers > 1:
        with multiprocessing.Pool(n_workers) as pool:
            for rec in pool.imap(fn, files, chunksize=8):
                writer.add(rec)
    else:
        for f in files:
            writer.add(fn(f))
    return writer.finalize()
