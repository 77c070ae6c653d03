"""TPU-native ops: resampling, fused activations, mesh rasterization."""

from stylerenderer_tpu.ops.fused_act import fused_leaky_relu, scaled_leaky_relu
from stylerenderer_tpu.ops.rasterize import (
    rasterize,
    rasterize_index_coeff,
    rasterize_pyramid,
    rasterize_winners,
    winner_coeff,
)
from stylerenderer_tpu.ops.upfirdn2d import (
    blur,
    downsample2d,
    make_kernel,
    upfirdn2d,
    upsample2d,
)

__all__ = [
    "blur",
    "downsample2d",
    "fused_leaky_relu",
    "make_kernel",
    "rasterize",
    "rasterize_index_coeff",
    "rasterize_pyramid",
    "rasterize_winners",
    "scaled_leaky_relu",
    "upfirdn2d",
    "upsample2d",
    "winner_coeff",
]
