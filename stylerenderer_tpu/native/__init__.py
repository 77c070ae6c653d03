"""Native (C++) runtime components, built on demand with g++ and loaded via
ctypes. Currently: the SRPack mmap'd data-shard reader."""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

_CACHE: dict[str, ctypes.CDLL] = {}


def _build(src_path: str) -> str:
    """Compile ``src_path`` to a cached shared object; returns the .so path."""
    with open(src_path, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    name = os.path.splitext(os.path.basename(src_path))[0]
    cache_dir = os.environ.get(
        "SRTPU_NATIVE_CACHE", os.path.join(tempfile.gettempdir(), "srtpu_native")
    )
    os.makedirs(cache_dir, exist_ok=True)
    so_path = os.path.join(cache_dir, f"{name}-{digest}.so")
    if not os.path.exists(so_path):
        tmp = so_path + f".tmp{os.getpid()}"
        subprocess.check_call(
            [
                "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
                "-pthread", src_path, "-o", tmp,
            ]
        )
        os.replace(tmp, so_path)
    return so_path


def load_srpack_lib() -> ctypes.CDLL:
    src = os.path.join(os.path.dirname(__file__), "srpack.cpp")
    if src not in _CACHE:
        lib = ctypes.CDLL(_build(src))
        lib.srpack_open.restype = ctypes.c_void_p
        lib.srpack_open.argtypes = [ctypes.c_char_p]
        lib.srpack_close.argtypes = [ctypes.c_void_p]
        lib.srpack_n_items.restype = ctypes.c_uint64
        lib.srpack_n_items.argtypes = [ctypes.c_void_p]
        lib.srpack_codec.restype = ctypes.c_uint32
        lib.srpack_codec.argtypes = [ctypes.c_void_p]
        lib.srpack_n_sizes.restype = ctypes.c_uint32
        lib.srpack_n_sizes.argtypes = [ctypes.c_void_p]
        lib.srpack_sizes.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint32)]
        lib.srpack_record_length.restype = ctypes.c_uint64
        lib.srpack_record_length.argtypes = [
            ctypes.c_void_p, ctypes.c_uint32, ctypes.c_uint64,
        ]
        lib.srpack_read_record.restype = ctypes.c_uint64
        lib.srpack_read_record.argtypes = [
            ctypes.c_void_p, ctypes.c_uint32, ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_uint64,
        ]
        lib.srpack_read_batch.restype = ctypes.c_int
        lib.srpack_read_batch.argtypes = [
            ctypes.c_void_p, ctypes.c_uint32, ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int, ctypes.POINTER(ctypes.c_uint8), ctypes.c_uint64,
        ]
        _CACHE[src] = lib
    return _CACHE[src]
