"""SRPack writer (python) + reader (native C++ via ctypes).

The multi-resolution shard replacing the reference's lmdb store
(``dataset.py:56-92`` MultiResolutionDataset + ``prepare_data.py``): every
image at every requested resolution, flat (offset, length) index, mmap'd
zero-copy batched reads in C++ worker threads.

Codecs: ``raw`` (uint8 HWC tensors — decode-free device feeding, the TPU
fast path) and ``jpeg`` (compact, PIL-decoded on read).
"""

from __future__ import annotations

import ctypes
import io
import struct
from typing import Sequence

import numpy as np

from stylerenderer_tpu.native import load_srpack_lib

_MAGIC = b"SRPK"
CODEC_RAW = 0
CODEC_JPEG = 1


class SRPackWriter:
    """Two-pass writer: stage records, then emit header+index+blob."""

    def __init__(self, path: str, sizes: Sequence[int], codec: str = "raw"):
        self.path = path
        self.sizes = [int(s) for s in sizes]
        self.codec = CODEC_RAW if codec == "raw" else CODEC_JPEG
        self._records: list[list[bytes]] = [[] for _ in self.sizes]

    def add(self, per_size_images):
        """per_size_images: list parallel to ``sizes``; each entry either a
        uint8 HWC array (raw) or encoded bytes (jpeg)."""
        assert len(per_size_images) == len(self.sizes)
        for i, img in enumerate(per_size_images):
            if self.codec == CODEC_RAW:
                arr = np.ascontiguousarray(img, np.uint8)
                s = self.sizes[i]
                assert arr.shape == (s, s, 3), (arr.shape, s)
                self._records[i].append(arr.tobytes())
            else:
                self._records[i].append(bytes(img))

    def finalize(self):
        n_items = len(self._records[0])
        assert all(len(r) == n_items for r in self._records)
        header = _MAGIC + struct.pack(
            "<IIIQ", 1, self.codec, len(self.sizes), n_items
        )
        sizes_blob = struct.pack(f"<{len(self.sizes)}I", *self.sizes)
        index = []
        offset = 0
        for recs in self._records:
            for r in recs:
                index.append((offset, len(r)))
                offset += len(r)
        index_blob = b"".join(struct.pack("<QQ", o, l) for o, l in index)
        with open(self.path, "wb") as f:
            f.write(header)
            f.write(sizes_blob)
            f.write(index_blob)
            for recs in self._records:
                for r in recs:
                    f.write(r)
        return n_items


class SRPackReader:
    """mmap'd reader over the native library."""

    def __init__(self, path: str):
        self._lib = load_srpack_lib()
        self._h = self._lib.srpack_open(path.encode())
        if not self._h:
            raise IOError(f"cannot open SRPack file {path!r}")
        self.n_items = int(self._lib.srpack_n_items(self._h))
        self.codec = int(self._lib.srpack_codec(self._h))
        n_sizes = int(self._lib.srpack_n_sizes(self._h))
        sizes = (ctypes.c_uint32 * n_sizes)()
        self._lib.srpack_sizes(self._h, sizes)
        self.sizes = [int(s) for s in sizes]

    def size_index(self, resolution: int) -> int:
        if resolution not in self.sizes:
            raise KeyError(
                f"resolution {resolution} not in pack (have {self.sizes})"
            )
        return self.sizes.index(resolution)

    def read_record(self, resolution: int, item: int) -> bytes:
        si = self.size_index(resolution)
        ln = int(self._lib.srpack_record_length(self._h, si, item))
        buf = (ctypes.c_uint8 * ln)()
        got = self._lib.srpack_read_record(self._h, si, item, buf, ln)
        return bytes(bytearray(buf))[: int(got)]

    def read_batch_raw(self, resolution: int, items: np.ndarray) -> np.ndarray:
        """Batched zero-decode read (raw codec): -> uint8 [N, s, s, 3]."""
        assert self.codec == CODEC_RAW, "read_batch_raw needs the raw codec"
        si = self.size_index(resolution)
        s = resolution
        items = np.ascontiguousarray(items, np.int64)
        n = len(items)
        stride = s * s * 3
        out = np.empty((n, s, s, 3), np.uint8)
        rc = self._lib.srpack_read_batch(
            self._h, si,
            items.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), n,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), stride,
        )
        if rc != 0:
            raise IndexError(f"srpack_read_batch failed rc={rc}")
        return out

    def decode(self, resolution: int, item: int) -> np.ndarray:
        """-> uint8 [s, s, 3] regardless of codec."""
        if self.codec == CODEC_RAW:
            return self.read_batch_raw(resolution, np.asarray([item]))[0]
        from PIL import Image

        raw = self.read_record(resolution, item)
        return np.asarray(Image.open(io.BytesIO(raw)).convert("RGB"))

    def close(self):
        if self._h:
            self._lib.srpack_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
