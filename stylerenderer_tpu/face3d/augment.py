"""ADA-style differentiable image augmentation (reference ``utils_3d.py``
``random_apply_color`` / ``random_apply_pose2D_img`` / ``augment``).

- color: brightness/contrast/luma-flip/hue-rotation-about-gray/saturation as
  one 3x4 color matrix applied per sample (utils_3d.py:155-188);
- geometric: translate/rotate/log-scale/h-flip via an inverse-warp bilinear
  resample with the reference's border-safe minimum-zoom corner logic
  (utils_3d.py:189-349, the ``pad=None`` -> corners branch used by
  ``augment``);
- ``ada_augment(rng, img, p)``: geometric ∘ color, applied per-sample with
  probability ``p`` (utils_3d.py:350-359) — the hook the ADA controller
  drives in the train step.

All jnp, NHWC, fully jittable and differentiable (the D-side augmentation
must pass gradients for the G adversarial loss to work under ADA).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from stylerenderer_tpu.face3d.transforms import rodrigues

COLOR_P = (0.2, 0.3, 0.0, 0.15, 0.5)  # bright, contrast, luma_flip, hue, sat
POSE_P = (0.1, 0.1, 0.05, 0.15, 0.0, 0.5)  # tx, ty, rz, s_var, s_mean, flip


def random_color_matrix(rng, batch: int, p=COLOR_P):
    """Per-sample 3x4 color transform (utils_3d.py:163-178)."""
    p = jnp.abs(jnp.asarray(p, jnp.float32))
    k1, k2, k3 = jax.random.split(rng, 3)
    z01 = jax.random.normal(k1, (batch, 2)) * p[:2]
    coin = jax.random.uniform(k2, (batch, 1))
    z34 = jax.random.normal(k3, (batch, 2)) * p[3:5]
    br = z01[:, 0:1]
    con = jnp.exp(z01[:, 1:2])
    luma = (coin < p[2]).astype(jnp.float32)
    hue = z34[:, 0:1]
    sat = jnp.exp(z34[:, 1:2])[..., None]

    o = jnp.zeros_like(br)
    eye = jnp.eye(3)[None]
    C = jnp.stack(
        [con, o, o, con * br, o, con, o, con * br, o, o, con, con * br], -1
    ).reshape(batch, 3, 4)
    # luma flip: reflection about the luminance plane, I - (2/3)·ones
    C = jnp.einsum("bij,bjk->bik", eye - luma[:, :, None] * (2.0 / 3.0), C)
    # hue rotation about the gray axis
    R = rodrigues(jnp.concatenate([hue, hue, hue], 1) / np.sqrt(3.0))
    C = jnp.einsum("bij,bjk->bik", R, C)
    # saturation: blend toward gray
    S = eye * sat + (1.0 - sat) / 3.0
    C = jnp.einsum("bij,bjk->bik", S, C)
    return C


def apply_color(img, C):
    """img [B,H,W,3], C [B,3,4] -> color-transformed image."""
    out = jnp.einsum("bhwc,boc->bhwo", img, C[:, :, :3]) + C[:, None, None, :, 3]
    return out


def _bilinear_sample(img, x, y):
    """Zero-padded bilinear sampling; x/y are normalized [-1,1] coords
    (torch grid_sample align_corners=False convention), shapes [B,H,W]."""
    b, h, w, c = img.shape
    px = ((x + 1.0) * w - 1.0) / 2.0
    py = ((y + 1.0) * h - 1.0) / 2.0
    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    wx = px - x0
    wy = py - y0

    def gather(ix, iy):
        inside = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
        ix_c = jnp.clip(ix, 0, w - 1).astype(jnp.int32)
        iy_c = jnp.clip(iy, 0, h - 1).astype(jnp.int32)
        bidx = jnp.arange(b)[:, None, None]
        vals = img[bidx, iy_c, ix_c]  # [B,H,W,C]
        return vals * inside[..., None].astype(img.dtype)

    v00 = gather(x0, y0)
    v01 = gather(x0 + 1, y0)
    v10 = gather(x0, y0 + 1)
    v11 = gather(x0 + 1, y0 + 1)
    wx = wx[..., None].astype(img.dtype)
    wy = wy[..., None].astype(img.dtype)
    return (
        v00 * (1 - wx) * (1 - wy)
        + v01 * wx * (1 - wy)
        + v10 * (1 - wx) * wy
        + v11 * wx * wy
    )


def random_pose2d(rng, img, p=POSE_P):
    """Random translate/rotate/scale/flip with border-safe min zoom
    (utils_3d.py:189-349, no-camera corners branch)."""
    b, h, w, _ = img.shape
    p = jnp.abs(jnp.asarray(p, jnp.float32))
    k1, k2, k3 = jax.random.split(rng, 3)
    z = jax.random.normal(k1, (b, 3)) * p[:3]
    s = jax.random.normal(k2, (b, 1)) * p[3] + p[4]
    coin = jax.random.uniform(k3, (b, 1))
    flip = coin < p[5]
    f = jnp.exp(s)  # [b,1]
    sn = jnp.sin(z[:, 2:3])
    cs = jnp.cos(z[:, 2:3])
    tx = z[:, 0:1]
    ty = z[:, 1:2]

    m = max(w, h) / 2.0
    ys, xs = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32),
        indexing="ij",
    )
    # pixel-CENTER coordinates so the identity transform resamples exactly
    # (align_corners=False convention in _bilinear_sample)
    x = ((xs + 0.5 - w / 2.0) / m)[None].repeat(b, 0)  # [b,h,w]
    y = ((h / 2.0 - ys - 0.5) / m)[None].repeat(b, 0)
    x = jnp.where(flip[:, :, None], -x, x)
    x = x - tx[:, :, None]
    y = y - ty[:, :, None]

    # border-safe minimum zoom: rotated output corners must stay inside the
    # pixel-CENTER extent (w-1, h-1), matching the sampling convention
    cx = jnp.stack([x[:, 0, 0], x[:, 0, -1], x[:, -1, 0], x[:, -1, -1]], 1)
    cy = jnp.stack([y[:, 0, 0], y[:, 0, -1], y[:, -1, 0], y[:, -1, -1]], 1)
    rx = (cs * cx + sn * cy) * (2.0 * m / max(w - 1.0, 1.0))
    ry = (-sn * cx + cs * cy) * (2.0 * m / max(h - 1.0, 1.0))
    fmax = jnp.max(jnp.abs(jnp.concatenate([rx, ry], 1)), 1, keepdims=True)
    f = jnp.maximum(f, fmax)

    x = x / f[:, :, None]
    y = y / f[:, :, None]
    x, y = cs[:, :, None] * x + sn[:, :, None] * y, \
        -sn[:, :, None] * x + cs[:, :, None] * y
    # normalized sample coords (y axis flips back to image convention)
    xg = x * (max(w, h) / float(w))
    yg = -y * (max(w, h) / float(h))
    return _bilinear_sample(img, xg, yg)


def random_pose2d_cam(rng, cam, p=POSE_P, in_size=None, out_size=None):
    """Apply the random 2D pose to CAMERA matrices instead of pixels
    (utils_3d.py:233-254, the ``img is None, cam is not None`` branch):
    scale the focal block by exp(N(0, s)), shift the principal point by the
    translation, mirror it on horizontal flip.

    cam: [B, 3, 3]; normalized intrinsics (principal point < 0.75) are
    upscaled by ``in_size`` and re-normalized by ``out_size``.
    """
    cam = jnp.asarray(cam)
    single = cam.ndim == 2
    if single:
        cam = cam[None]
    b = cam.shape[0]
    p = jnp.abs(jnp.asarray(p, jnp.float32))
    k1, k2, k3 = jax.random.split(rng, 3)
    z = jax.random.normal(k1, (b, 3)) * p[:3]
    f = jnp.exp(jax.random.normal(k2, (b, 1)) * p[3] + p[4])
    flip = jax.random.uniform(k3, (b, 1)) < p[5]
    tx, ty = z[:, 0:1], z[:, 1:2]

    normalized = bool(in_size) and bool(out_size)
    wi = hi = in_size or 1
    wo = ho = out_size or in_size or 1
    cam_px = cam
    if normalized:
        cam_px = cam * jnp.asarray([[wi], [hi], [1.0]])[None]
    scale = jnp.concatenate(
        [f, f, jnp.ones_like(f)] * 2 + [jnp.ones_like(f)] * 3, axis=1
    ).reshape(b, 3, 3)
    shift = jnp.zeros((b, 3, 3)).at[:, 0, 2].set(
        (tx * cam_px[:, 0, 0:1])[:, 0]
    ).at[:, 1, 2].set((-ty * cam_px[:, 1, 1:2])[:, 0])
    out = cam_px * scale + shift
    if normalized:
        out = out / jnp.asarray([[wo], [ho], [1.0]])[None]
        out = out.at[:, 0, 2].set(
            jnp.where(flip[:, 0], 1 - out[:, 0, 2], out[:, 0, 2])
        )
    else:
        out = out.at[:, 0, 2].set(
            jnp.where(flip[:, 0], wo - out[:, 0, 2], out[:, 0, 2])
        )
    return out[0] if single else out


def ada_augment(rng, img, p, color_p=COLOR_P, pose_p=POSE_P):
    """Geometric + color augmentation applied per-sample with prob ``p``
    (utils_3d.py:350-359)."""
    b = img.shape[0]
    k1, k2, k3 = jax.random.split(rng, 3)
    aug = random_pose2d(k1, img, pose_p)
    aug = apply_color(aug, random_color_matrix(k2, b, color_p))
    keep = jax.random.uniform(k3, (b, 1, 1, 1)) < p
    return jnp.where(keep, aug.astype(img.dtype), img)
