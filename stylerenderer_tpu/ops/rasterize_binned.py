"""Binned (tiled) winner search for production-size meshes at high resolution.

Planned design (see package docstring in ``rasterize.py``): sort (tile, tri)
pairs by tile, then a Pallas kernel with per-tile VMEM z-buffers streams each
tile's triangle list. Until that lands, this falls back to the dense chunked
search — correct, just not yet at the production roofline.
"""

from __future__ import annotations

from stylerenderer_tpu.ops import rasterize as _dense


def rasterize_winners_binned(v, tri, h, w, perspective=False, eps=1e-6):
    return _dense.rasterize_winners(v, tri, h, w, perspective, eps)
