"""upfirdn2d — upsample, FIR filter, downsample in one fused XLA convolution.

Semantics match the reference implementation (``/root/reference/op/upfirdn2d.py:159-200``
``upfirdn2d_native`` and the CUDA kernel ``op/upfirdn2d_kernel.cu``):

1. zero-stuff the input by ``up`` (sample at phase 0 of each ``up`` block),
2. pad by ``(pad0, pad1)`` per spatial dim — negative pads crop,
3. convolve (true convolution, i.e. cross-correlate with the flipped kernel),
4. decimate by ``down`` (keep samples ``0, down, 2*down, ...``).

Output size per dim: ``(in*up + pad0 + pad1 - kernel) // down + 1``.

TPU-native design: the whole pipeline is ONE ``lax.conv_general_dilated`` call —
``lhs_dilation`` performs the zero-stuffing, the conv padding performs the
pad/crop (XLA supports negative conv padding natively), and ``window_strides``
performs the decimation. XLA fuses the surrounding elementwise ops, so a
hand-written Pallas kernel adds nothing here; the compiler already emits a
single fused loop over VMEM tiles.

Layout: NHWC (TPU-native). The filter is applied depthwise (per channel).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def make_kernel(k) -> jnp.ndarray:
    """Build a normalized 2-D FIR kernel from a 1-D or 2-D tap list.

    Mirrors reference ``layers.py:7-12``: a 1-D list becomes its outer
    product; the kernel is normalized to sum 1.
    """
    k = jnp.asarray(k, dtype=jnp.float32)
    if k.ndim == 1:
        k = k[None, :] * k[:, None]
    k = k / jnp.sum(k)
    return k


def _as_pair(v) -> tuple[int, int]:
    if isinstance(v, (tuple, list)):
        if len(v) == 1:
            return (int(v[0]), int(v[0]))
        return (int(v[0]), int(v[1]))
    return (int(v), int(v))


def upfirdn2d(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    up: int | tuple[int, int] = 1,
    down: int | tuple[int, int] = 1,
    pad: tuple[int, int] | tuple[int, int, int, int] = (0, 0),
) -> jnp.ndarray:
    """Upsample-FIR-downsample ``x`` (NHWC) with a 2-D ``kernel``.

    Args:
      x: ``[B, H, W, C]`` input.
      kernel: ``[kh, kw]`` FIR taps (applied as true convolution).
      up / down: integer (or ``(x, y)`` pair) resampling factors.
      pad: ``(pad0, pad1)`` applied to both dims, or
        ``(pad_x0, pad_x1, pad_y0, pad_y1)``. Negative values crop.

    Returns:
      ``[B, H_out, W_out, C]`` with
      ``H_out = (H*up_y + pad_y0 + pad_y1 - kh)//down_y + 1`` (same for W).
    """
    up_x, up_y = _as_pair(up)
    down_x, down_y = _as_pair(down)
    if len(pad) == 2:
        pad_x0, pad_x1 = int(pad[0]), int(pad[1])
        pad_y0, pad_y1 = int(pad[0]), int(pad[1])
    else:
        pad_x0, pad_x1, pad_y0, pad_y1 = (int(p) for p in pad)

    b, h, w, c = x.shape
    kh, kw = kernel.shape

    out_h = (h * up_y + pad_y0 + pad_y1 - kh) // down_y + 1
    out_w = (w * up_x + pad_x0 + pad_x1 - kw) // down_x + 1
    if out_h <= 0 or out_w <= 0:
        raise ValueError(
            f"upfirdn2d produces empty output: in={h}x{w} up={up_y}x{up_x} "
            f"pad=({pad_y0},{pad_y1},{pad_x0},{pad_x1}) k={kh}x{kw} down={down_y}x{down_x}"
        )

    # lhs_dilation inserts (up-1) zeros BETWEEN samples, i.e. the dilated
    # extent is in*up - (up-1); the reference zero-stuffs to in*up (with up-1
    # trailing zeros). Compensate by adding up-1 to the trailing pad — the
    # extra positions are zeros either way, so values are identical.
    pad_y1_eff = pad_y1 + up_y - 1
    pad_x1_eff = pad_x1 + up_x - 1

    # True convolution == cross-correlation with the flipped kernel.
    k = jnp.flip(kernel, (0, 1)).astype(x.dtype)
    # Depthwise filter in HWIO with feature_group_count=C.
    k = jnp.tile(k[:, :, None, None], (1, 1, 1, c))

    out = lax.conv_general_dilated(
        x,
        k,
        window_strides=(down_y, down_x),
        padding=((pad_y0, pad_y1_eff), (pad_x0, pad_x1_eff)),
        lhs_dilation=(up_y, up_x),
        rhs_dilation=(1, 1),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )
    assert out.shape == (b, out_h, out_w, c), (out.shape, (b, out_h, out_w, c))
    return out


def upfirdn2d_ref(x, kernel, up=1, down=1, pad=(0, 0)):
    """Slow, obviously-correct numpy oracle of the same semantics (for tests).

    Written directly from the mathematical definition (zero-stuff → pad/crop
    → convolve → decimate), independent of the conv-based implementation.
    """
    up_x, up_y = _as_pair(up)
    down_x, down_y = _as_pair(down)
    if len(pad) == 2:
        pad_x0, pad_x1 = pad[0], pad[1]
        pad_y0, pad_y1 = pad[0], pad[1]
    else:
        pad_x0, pad_x1, pad_y0, pad_y1 = pad

    x = np.asarray(x, np.float64)
    kernel = np.asarray(kernel, np.float64)
    b, h, w, c = x.shape
    kh, kw = kernel.shape

    # zero-stuff
    hs, ws = h * up_y, w * up_x
    stuffed = np.zeros((b, hs, ws, c), np.float64)
    stuffed[:, ::up_y, ::up_x, :] = x

    # pad (positive) then crop (negative)
    padded = np.pad(
        stuffed,
        (
            (0, 0),
            (max(pad_y0, 0), max(pad_y1, 0)),
            (max(pad_x0, 0), max(pad_x1, 0)),
            (0, 0),
        ),
    )
    padded = padded[
        :,
        max(-pad_y0, 0) : padded.shape[1] - max(-pad_y1, 0),
        max(-pad_x0, 0) : padded.shape[2] - max(-pad_x1, 0),
        :,
    ]

    out_h = (h * up_y + pad_y0 + pad_y1 - kh) // down_y + 1
    out_w = (w * up_x + pad_x0 + pad_x1 - kw) // down_x + 1
    out = np.zeros((b, out_h, out_w, c), np.float64)
    kf = kernel[::-1, ::-1]  # true convolution
    for oy in range(out_h):
        for ox in range(out_w):
            iy = oy * down_y
            ix = ox * down_x
            patch = padded[:, iy : iy + kh, ix : ix + kw, :]
            out[:, oy, ox, :] = np.einsum("bhwc,hw->bc", patch, kf)
    return out


# ----- StyleGAN2 resampling wrappers (pad arithmetic from reference layers.py) -----


@functools.partial(jax.jit, static_argnames=("factor",))
def upsample2d(x, kernel, factor: int = 2):
    """FIR upsample by ``factor`` (reference ``layers.py:170-181`` Upsample)."""
    kernel = kernel * (factor**2)
    p = kernel.shape[0] - factor
    pad0 = (p + 1) // 2 + factor - 1
    pad1 = p // 2
    return upfirdn2d(x, kernel, up=factor, down=1, pad=(pad0, pad1))


@functools.partial(jax.jit, static_argnames=("factor",))
def downsample2d(x, kernel, factor: int = 2):
    """FIR downsample by ``factor`` (reference ``layers.py:182-193`` Downsample)."""
    p = kernel.shape[0] - factor
    pad0 = (p + 1) // 2
    pad1 = p // 2
    return upfirdn2d(x, kernel, up=1, down=factor, pad=(pad0, pad1))


def blur(x, kernel, pad, upsample_factor: int = 1):
    """FIR blur with explicit pad (reference ``layers.py:194-203`` Blur)."""
    if upsample_factor > 1:
        kernel = kernel * (upsample_factor**2)
    return upfirdn2d(x, kernel, pad=pad)
