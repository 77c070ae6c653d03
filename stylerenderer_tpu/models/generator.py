"""StyleGAN2 Generator and the GAR (GeneratorWithMap) — TPU-native.

Re-designs ``/root/reference/model.py:11-295``:

- ``Generator``: mapping MLP (PixelNorm + n_mlp equalized linears), constant
  4x4 input, skip-connection ToRGB chain, 2 styled convs + ToRGB per
  resolution, per-layer noise, style mixing and the truncation trick.
- ``GeneratorWithMap``: the Generative Adversarial Renderer. At 4x4 and at
  every upsample step the 3DMM mesh normals are rasterized at the current
  feature resolution; each normal map runs through a small per-resolution
  CNN ("norm_to_style") producing (scale, shift) FiLM maps that spatially
  modulate the styled convolutions *before* noise/activation — the paper's
  Normal Injection Module (model.py:33-55, 188-295).

JIT-friendly deviations from the torch original (same semantics):
- style mixing uses a traced ``inject_index`` with a static-shape
  ``where(arange < idx)`` select instead of dynamic concatenation;
- noise comes from flax RNGs (or an explicit list / the stored constants),
  never from data-dependent control flow.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from stylerenderer_tpu.nn.layers import (
    Blur,
    ConstantInput,
    ConvLayer,
    EqualLinear,
    ModulatedConv2d,
    NoiseInjection,
    PixelNorm,
    ResBlock,
    Upsample,
)
from stylerenderer_tpu.ops.fused_act import fused_leaky_relu
from stylerenderer_tpu.ops.rasterize import rasterize


def channel_table(channel_multiplier: int = 2) -> dict[int, int]:
    """StyleGAN2 config-f channel schedule (model.py:96-105)."""
    return {
        4: 512,
        8: 512,
        16: 512,
        32: 512,
        64: 256 * channel_multiplier,
        128: 128 * channel_multiplier,
        256: 64 * channel_multiplier,
        512: 32 * channel_multiplier,
        1024: 16 * channel_multiplier,
    }


class StyledConv(nn.Module):
    """ModulatedConv2d + noise + fused bias-lrelu (model.py:11-32)."""

    out_channel: int
    kernel_size: int
    style_dim: int
    upsample: bool = False
    blur_kernel: Sequence[int] = (1, 3, 3, 1)
    demodulate: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, style, noise=None):
        x = ModulatedConv2d(
            self.out_channel, self.kernel_size, self.style_dim,
            demodulate=self.demodulate, upsample=self.upsample,
            blur_kernel=self.blur_kernel, dtype=self.dtype, name="conv",
        )(x, style)
        x = NoiseInjection(name="noise")(x, noise)
        bias = self.param("act_bias", nn.initializers.zeros, (self.out_channel,))
        return fused_leaky_relu(x, bias)


class StyledMapConv(nn.Module):
    """StyledConv with spatial FiLM from the normal map (model.py:33-55):
    ``out = conv(out, style) * map[..., :1] + map[..., 1:2]`` pre-noise."""

    out_channel: int
    kernel_size: int
    style_dim: int
    upsample: bool = False
    blur_kernel: Sequence[int] = (1, 3, 3, 1)
    demodulate: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, style, stylemap, noise=None):
        x = ModulatedConv2d(
            self.out_channel, self.kernel_size, self.style_dim,
            demodulate=self.demodulate, upsample=self.upsample,
            blur_kernel=self.blur_kernel, dtype=self.dtype, name="conv",
        )(x, style)
        x = x * stylemap[..., 0:1] + stylemap[..., 1:2]
        x = NoiseInjection(name="noise")(x, noise)
        bias = self.param("act_bias", nn.initializers.zeros, (self.out_channel,))
        return fused_leaky_relu(x, bias)


class ToRGB(nn.Module):
    """1x1 modconv (no demod) + bias, upsampled skip add (model.py:56-69)."""

    style_dim: int
    upsample: bool = True
    blur_kernel: Sequence[int] = (1, 3, 3, 1)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, style, skip=None):
        out = ModulatedConv2d(
            3, 1, self.style_dim, demodulate=False, dtype=self.dtype, name="conv"
        )(x, style)
        bias = self.param("bias", nn.initializers.zeros, (1, 1, 1, 3))
        out = out + bias.astype(out.dtype)
        if skip is not None:
            skip = Upsample(self.blur_kernel)(skip)
            out = out + skip
        return out


class MappingNetwork(nn.Module):
    """PixelNorm + n_mlp equalized linears with fused lrelu (model.py:91-95)."""

    style_dim: int
    n_mlp: int
    lr_mlp: float = 0.01

    @nn.compact
    def __call__(self, z):
        w = PixelNorm()(z)
        for i in range(self.n_mlp):
            w = EqualLinear(
                self.style_dim, lr_mul=self.lr_mlp, activation="fused_lrelu",
                name=f"fc{i}",
            )(w)
        return w


def make_noise(rng, size: int, batch: int = 1):
    """Per-layer noise list (reference model.py:125-131): one 4x4 map, then
    two per resolution 8..size."""
    log_size = int(math.log2(size))
    num_layers = (log_size - 2) * 2 + 1
    keys = jax.random.split(rng, num_layers)
    out = []
    for i in range(num_layers):
        res = 2 ** ((i + 5) // 2)
        out.append(jax.random.normal(keys[i], (batch, res, res, 1)))
    return out


def stored_noise(num_layers: int):
    """Fixed per-layer noise constants — the reference's registered
    noise_%d buffers (model.py:114-119). Deterministic (fixed seeds), so
    they need no checkpoint storage; XLA folds them into the executable.

    NOTE these are *different draws* than any imported reference
    checkpoint's buffers: to reproduce a ported torch model's
    ``randomize_noise=False`` outputs bitwise, pass
    ``utils.torch_import.import_noise(state_dict)`` as ``noise=`` instead
    of relying on these constants."""
    out = []
    for i in range(num_layers):
        res = 2 ** ((i + 5) // 2)
        out.append(jax.random.normal(jax.random.PRNGKey(i), (1, res, res, 1)))
    return out


def _mix_styles(styles, n_latent: int, inject_index, truncation, truncation_latent):
    """Build the [B, n_latent, D] per-layer latents with optional truncation
    and two-style mixing (model.py:241-258), static shapes throughout."""
    if truncation is not None and truncation_latent is not None:
        styles = [
            truncation_latent + truncation * (s - truncation_latent) for s in styles
        ]
    if len(styles) == 1:
        s = styles[0]
        if s.ndim == 3:  # already per-layer latents [B, n_latent, D]
            return s
        return jnp.tile(s[:, None, :], (1, n_latent, 1))
    assert len(styles) == 2
    if inject_index is None:
        inject_index = n_latent // 2
    layer = jnp.arange(n_latent)[None, :, None]
    return jnp.where(
        layer < inject_index, styles[0][:, None, :], styles[1][:, None, :]
    )


class Generator(nn.Module):
    """Unconditional StyleGAN2 generator (model.py:71-187)."""

    size: int
    style_dim: int = 512
    n_mlp: int = 8
    channel_multiplier: int = 2
    blur_kernel: Sequence[int] = (1, 3, 3, 1)
    lr_mlp: float = 0.01
    dtype: Any = jnp.float32
    remat: bool = False  # rematerialize styled convs (memory for 1024px)

    @property
    def log_size(self) -> int:
        return int(math.log2(self.size))

    @property
    def n_latent(self) -> int:
        return self.log_size * 2 - 2

    @property
    def num_layers(self) -> int:
        return (self.log_size - 2) * 2 + 1

    def setup(self):
        ch = channel_table(self.channel_multiplier)
        self.style = MappingNetwork(self.style_dim, self.n_mlp, self.lr_mlp)
        self.input = ConstantInput(ch[4])
        StyledConv_ = nn.remat(StyledConv) if self.remat else StyledConv
        self.conv1 = StyledConv_(
            ch[4], 3, self.style_dim, blur_kernel=self.blur_kernel, dtype=self.dtype
        )
        self.to_rgb1 = ToRGB(self.style_dim, upsample=False, dtype=self.dtype)
        convs, to_rgbs = [], []
        in_channel = ch[4]
        for i in range(3, self.log_size + 1):
            out_channel = ch[2**i]
            convs.append(
                StyledConv_(
                    out_channel, 3, self.style_dim, upsample=True,
                    blur_kernel=self.blur_kernel, dtype=self.dtype,
                )
            )
            convs.append(
                StyledConv_(
                    out_channel, 3, self.style_dim,
                    blur_kernel=self.blur_kernel, dtype=self.dtype,
                )
            )
            to_rgbs.append(ToRGB(self.style_dim, dtype=self.dtype))
            in_channel = out_channel
        self.convs = convs
        self.to_rgbs = to_rgbs

    def get_latent(self, z):
        return self.style(z)

    def mean_latent(self, rng, n_latent: int):
        z = jax.random.normal(rng, (n_latent, self.style_dim))
        return jnp.mean(self.style(z), axis=0, keepdims=True)

    def __call__(
        self,
        styles,
        return_latents: bool = False,
        inject_index=None,
        truncation: float | None = None,
        truncation_latent=None,
        input_is_latent: bool = False,
        noise=None,
        randomize_noise: bool = True,
    ):
        if not isinstance(styles, (list, tuple)):
            styles = [styles]
        if not input_is_latent:
            styles = [self.style(s) for s in styles]
        if noise is None:
            if randomize_noise:
                noise = [None] * self.num_layers
            else:  # stored constant buffers (model.py:148-153)
                noise = stored_noise(self.num_layers)
        latent = _mix_styles(
            styles, self.n_latent, inject_index, truncation, truncation_latent
        )

        out = self.input(latent.shape[0]).astype(self.dtype)
        out = self.conv1(out, latent[:, 0], noise=noise[0])
        skip = self.to_rgb1(out, latent[:, 1])

        i = 1
        for level in range(len(self.to_rgbs)):
            out = self.convs[2 * level](out, latent[:, i], noise=noise[1 + 2 * level])
            out = self.convs[2 * level + 1](
                out, latent[:, i + 1], noise=noise[2 + 2 * level]
            )
            skip = self.to_rgbs[level](out, latent[:, i + 2], skip)
            i += 2

        image = skip
        return image, (latent if return_latents else None)


class GeneratorWithMap(nn.Module):
    """The GAR: Generator conditioned on rasterized mesh normals
    (model.py:188-295).

    ``mesh = (vert [B,nv,3], norm [B,nv,3], tri [nf,3])``. Normal maps are
    rasterized at 4x4 and at every upsample step; a per-resolution CNN turns
    each into 2-channel-per-conv (scale, shift) FiLM maps.

    ``pyramid_mode``: ``'each'`` rasterizes per level (reference-exact);
    ``'downsample'`` rasterizes once at full resolution and average-pools the
    pyramid — ~6x fewer rasterizer calls, a TPU-first fast path.

    ``fused_pyramid``: interpolate normals inside the Pallas winner kernel
    (no forward per-pixel gathers; values match to f32 rounding). Still
    differentiable — a custom VJP recomputes the interpolation-only mesh
    gradients from the winner maps on the backward pass, so inversion
    (which optimizes the mesh) works unchanged while forward-only use
    (training samples meshes under no_grad, train.py:248-251; generation;
    eval) never pays the gather cost.
    """

    size: int
    style_dim: int = 512
    n_mlp: int = 8
    n_stylemap: int = 3
    channel_multiplier: int = 2
    blur_kernel: Sequence[int] = (1, 3, 3, 1)
    lr_mlp: float = 0.01
    dtype: Any = jnp.float32
    pyramid_mode: str = "each"
    rasterize_method: str = "auto"
    fused_pyramid: bool = True
    remat: bool = False  # rematerialize styled convs (memory for 1024px)

    @property
    def log_size(self) -> int:
        return int(math.log2(self.size))

    @property
    def n_latent(self) -> int:
        return self.log_size * 2 - 2

    @property
    def num_layers(self) -> int:
        return (self.log_size - 2) * 2 + 1

    def setup(self):
        ch = channel_table(self.channel_multiplier)
        self.style = MappingNetwork(self.style_dim, self.n_mlp, self.lr_mlp)
        self.input = ConstantInput(ch[4])
        if self.n_stylemap != 3:
            self.norm1_pre = ConvLayer(self.n_stylemap, 3, dtype=self.dtype)
        self.norm1 = ResBlock(2, downsample=False, dtype=self.dtype)
        StyledMapConv_ = nn.remat(StyledMapConv) if self.remat else StyledMapConv
        self.conv1 = StyledMapConv_(
            ch[4], 3, self.style_dim, blur_kernel=self.blur_kernel, dtype=self.dtype
        )
        self.to_rgb1 = ToRGB(self.style_dim, upsample=False, dtype=self.dtype)
        convs, to_rgbs, norm_to_style, norm_to_style_pre = [], [], [], []
        in_channel = ch[4]
        for i in range(3, self.log_size + 1):
            out_channel = ch[2**i]
            convs.append(
                StyledMapConv_(
                    out_channel, 3, self.style_dim, upsample=True,
                    blur_kernel=self.blur_kernel, dtype=self.dtype,
                )
            )
            convs.append(
                StyledMapConv_(
                    out_channel, 3, self.style_dim,
                    blur_kernel=self.blur_kernel, dtype=self.dtype,
                )
            )
            if self.n_stylemap != 3:
                norm_to_style_pre.append(ConvLayer(self.n_stylemap, 3, dtype=self.dtype))
            norm_to_style.append(ResBlock(4, downsample=False, dtype=self.dtype))
            to_rgbs.append(ToRGB(self.style_dim, dtype=self.dtype))
            in_channel = out_channel
        self.convs = convs
        self.to_rgbs = to_rgbs
        self.norm_to_style = norm_to_style
        self.norm_to_style_pre = norm_to_style_pre

    def get_latent(self, z):
        return self.style(z)

    def mean_latent(self, rng, n_latent: int):
        z = jax.random.normal(rng, (n_latent, self.style_dim))
        return jnp.mean(self.style(z), axis=0, keepdims=True)

    def normal_pyramid(self, mesh):
        """Rasterized normal maps at 4, 8, ..., size (NHWC, 3 channels)."""
        vert, norm, tri = mesh
        sizes = [4] + [2**i for i in range(3, self.log_size + 1)]
        if self.pyramid_mode == "downsample":
            if self.fused_pyramid:
                from stylerenderer_tpu.ops.rasterize import (
                    rasterize_pyramid_fused,
                )

                top = rasterize_pyramid_fused(
                    vert, norm, tri, [self.size],
                    method=self.rasterize_method,
                )[0]
            else:
                top = rasterize(
                    vert, norm, tri, self.size, self.size,
                    method=self.rasterize_method,
                )
            maps = {self.size: top}
            cur = top
            for s in reversed(sizes[:-1]):
                cur = jax.image.resize(
                    cur, (cur.shape[0], s, s, cur.shape[-1]), "linear"
                )
                maps[s] = cur
            return [maps[s] for s in sizes]
        # reference-exact per-level rasterization; on TPU the power-of-two
        # tail of the pyramid comes from ONE multi-level Pallas pass
        from stylerenderer_tpu.ops.rasterize import (
            rasterize_pyramid, rasterize_pyramid_fused,
        )

        fn = rasterize_pyramid_fused if self.fused_pyramid else rasterize_pyramid
        return fn(vert, norm, tri, sizes, method=self.rasterize_method)

    def synthesize(self, latent, norm_maps, noise=None):
        """Conditioned synthesis from per-layer latents ``[B, n_latent, D]``
        and an explicit normal-map pyramid (a list, smallest first).

        Exposed separately so path-length regularization can differentiate
        with respect to both the latents and the pyramid (train.py:340-345
        semantics, functional form)."""
        if noise is None:
            noise = [None] * self.num_layers
        norm_maps = [m.astype(self.dtype) for m in norm_maps]

        out = self.input(latent.shape[0]).astype(self.dtype)
        maps = norm_maps[0]
        if self.n_stylemap != 3:
            maps = self.norm1_pre(maps)
        maps = self.norm1(maps)
        out = self.conv1(out, latent[:, 0], maps, noise=noise[0])
        skip = self.to_rgb1(out, latent[:, 1])

        i = 1
        for level in range(len(self.to_rgbs)):
            nm = norm_maps[level + 1]
            if self.n_stylemap != 3:
                nm = self.norm_to_style_pre[level](nm)
            maps = self.norm_to_style[level](nm)
            out = self.convs[2 * level](
                out, latent[:, i], maps[..., :2], noise=noise[1 + 2 * level]
            )
            out = self.convs[2 * level + 1](
                out, latent[:, i + 1], maps[..., 2:], noise=noise[2 + 2 * level]
            )
            skip = self.to_rgbs[level](out, latent[:, i + 2], skip)
            i += 2
        return skip

    def __call__(
        self,
        styles,
        mesh,
        return_normals: bool = False,
        return_latents: bool = False,
        inject_index=None,
        truncation: float | None = None,
        truncation_latent=None,
        input_is_latent: bool = False,
        noise=None,
        randomize_noise: bool = True,
    ):
        if not isinstance(styles, (list, tuple)):
            styles = [styles]
        if not input_is_latent:
            styles = [self.style(s) for s in styles]
        if noise is None and not randomize_noise:
            noise = stored_noise(self.num_layers)
        latent = _mix_styles(
            styles, self.n_latent, inject_index, truncation, truncation_latent
        )
        norm_maps = self.normal_pyramid(mesh)
        image = self.synthesize(latent, norm_maps, noise)
        return (
            image,
            (latent if return_latents else None),
            (norm_maps if return_normals else None),
        )
