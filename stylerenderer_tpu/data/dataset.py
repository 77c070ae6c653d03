"""Datasets + a prefetching host->device input pipeline.

- ``SRPackDataset``: multi-resolution shard dataset (the reference's
  ``MultiResolutionDataset``, dataset.py:56-92, over SRPack instead of lmdb).
- ``ImageFolderDataset``: recursive extension-filtered folder walk with
  resize-on-read (the reference's ``ImgDataset``, dataset.py:8-55).
- ``prefetch_batches``: background-thread pipeline that keeps the device fed:
  native batched reads (+ optional augmentation-side transforms) overlap with
  the device step.

Training transform matches the reference (train.py:557-560): random
horizontal flip, scale to [-1, 1], NHWC float32.
"""

from __future__ import annotations

import os
import queue
import threading
from typing import Iterator, Sequence

import numpy as np

from stylerenderer_tpu.data.srpack import SRPackReader

IMG_EXTENSIONS = (".png", ".jpg", ".jpeg", ".bmp", ".webp", ".ppm", ".tif", ".tiff")


def to_train_tensor(batch_u8: np.ndarray, rng: np.random.Generator | None = None,
                    hflip: bool = True) -> np.ndarray:
    """uint8 [B,H,W,3] -> float32 [-1,1], random horizontal flip per sample."""
    x = batch_u8.astype(np.float32) / 127.5 - 1.0
    if hflip and rng is not None:
        flips = rng.random(len(x)) < 0.5
        x[flips] = x[flips, :, ::-1]
    return x


class SRPackDataset:
    """Multi-resolution dataset over an SRPack shard."""

    def __init__(self, path: str, resolution: int = 256):
        self.reader = SRPackReader(path)
        if resolution not in self.reader.sizes:
            raise ValueError(
                f"resolution {resolution} missing from {path} "
                f"(available: {self.reader.sizes})"
            )
        self.resolution = resolution

    def __len__(self):
        return self.reader.n_items

    def __getitem__(self, idx: int) -> np.ndarray:
        return self.reader.decode(self.resolution, idx)

    def read_batch(self, indices: np.ndarray) -> np.ndarray:
        if self.reader.codec == 0:
            return self.reader.read_batch_raw(self.resolution, indices)
        return np.stack([self.reader.decode(self.resolution, int(i)) for i in indices])


class ImageFolderDataset:
    """Recursive folder of images, resized on read (dataset.py:8-55)."""

    def __init__(self, root: str, resolution: int = 256,
                 extensions: Sequence[str] = IMG_EXTENSIONS):
        self.root = root
        self.resolution = resolution
        self.files = []
        for dirpath, _, names in os.walk(root):
            for n in sorted(names):
                if os.path.splitext(n)[1].lower() in extensions:
                    self.files.append(os.path.join(dirpath, n))
        self.files.sort()

    def __len__(self):
        return len(self.files)

    def __getitem__(self, idx: int) -> np.ndarray:
        from PIL import Image

        img = Image.open(self.files[idx]).convert("RGB")
        if self.resolution:
            img = img.resize((self.resolution, self.resolution), Image.LANCZOS)
        return np.asarray(img)

    def read_batch(self, indices) -> np.ndarray:
        return np.stack([self[int(i)] for i in indices])


def device_prefetch(iterator, depth: int = 2, sharding=None):
    """Overlap host->device transfer with compute: keep ``depth`` batches
    in flight on device ahead of the consumer."""
    import collections

    import jax

    buf = collections.deque()

    def put(x):
        return jax.device_put(x, sharding) if sharding is not None else \
            jax.device_put(x)

    for batch in iterator:
        buf.append(put(batch))
        if len(buf) >= depth:
            yield buf.popleft()
    while buf:
        yield buf.popleft()


def prefetch_batches(
    dataset, batch_size: int, *, seed: int = 0, train: bool = True,
    depth: int = 3, drop_last: bool = True,
) -> Iterator[np.ndarray]:
    """Endless (train) or single-epoch (eval) iterator of float32 [-1,1]
    NHWC batches, assembled in a background thread."""
    n = len(dataset)
    q: queue.Queue = queue.Queue(maxsize=depth)
    stop = threading.Event()

    def worker():
        rng = np.random.default_rng(seed)
        while not stop.is_set():
            order = rng.permutation(n) if train else np.arange(n)
            for i in range(0, n - (batch_size - 1 if drop_last else 0), batch_size):
                idx = order[i : i + batch_size]
                if len(idx) == 0:
                    break
                raw = dataset.read_batch(idx)
                batch = to_train_tensor(raw, rng if train else None, hflip=train)
                while not stop.is_set():
                    try:
                        q.put(batch, timeout=0.5)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
            if not train:
                q.put(None)
                return

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is None:
                return
            yield item
    finally:
        stop.set()
