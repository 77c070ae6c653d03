"""Image grid export (the torchvision save_image equivalent used at
train.py:398-410 / generate.py:20-24)."""

from __future__ import annotations

import math

import numpy as np


def to_uint8(img, value_range=(-1.0, 1.0)):
    lo, hi = value_range
    x = (np.asarray(img, np.float32) - lo) / (hi - lo)
    return (np.clip(x, 0, 1) * 255 + 0.5).astype(np.uint8)


def make_grid(images, nrow: int | None = None, padding: int = 0):
    """[N,H,W,C] float [-1,1] -> [gh*H, gw*W, C] uint8 grid."""
    images = np.asarray(images)
    n, h, w, c = images.shape
    if nrow is None:
        nrow = int(math.ceil(math.sqrt(n)))
        while nrow > 1 and n % nrow != 0:
            nrow -= 1
    gw = nrow
    gh = int(math.ceil(n / gw))
    grid = np.zeros(
        (gh * (h + padding) - padding, gw * (w + padding) - padding, c), np.uint8
    )
    u8 = to_uint8(images)
    for i in range(n):
        r, col = divmod(i, gw)
        grid[
            r * (h + padding) : r * (h + padding) + h,
            col * (w + padding) : col * (w + padding) + w,
        ] = u8[i]
    return grid


def save_image_grid(path: str, images, nrow: int | None = None, padding: int = 0):
    from PIL import Image

    Image.fromarray(make_grid(images, nrow, padding)).save(path)
    return path
