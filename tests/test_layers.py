"""Layer parity tests vs torch oracles of the reference semantics.

The oracles re-derive the StyleGAN2 algorithms (equalized lr, weight
modulation/demodulation with the grouped-conv trick, FIR blur pads) from
their published definitions; weights are shared with the flax modules so
outputs must match to float32 tolerance.
"""

import math

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from stylerenderer_tpu.nn.layers import (  # noqa: E402
    ConvLayer,
    EqualConv2d,
    EqualLinear,
    ModulatedConv2d,
    PixelNorm,
    ResBlock,
    minibatch_stddev,
)
from stylerenderer_tpu.ops.upfirdn2d import upfirdn2d_ref, make_kernel  # noqa: E402


def _nchw(x_nhwc):
    return np.transpose(np.asarray(x_nhwc), (0, 3, 1, 2))


def _nhwc(x_nchw):
    return np.transpose(np.asarray(x_nchw), (0, 2, 3, 1))


def torch_modconv_oracle(
    x_nchw, w_oikk, mod_w, mod_b, style, demodulate, up, down, blur_kernel=(1, 3, 3, 1)
):
    """Reference ModulatedConv2d semantics: per-sample weight scaling +
    demodulation + grouped conv (conv_transpose for up), FIR blur around it."""
    x = torch.from_numpy(x_nchw)
    w = torch.from_numpy(w_oikk)
    style = torch.from_numpy(style)
    B, in_c, H, W = x.shape
    out_c, _, k, _ = w.shape
    style_dim = style.shape[1]

    # EqualLinear(style_dim -> in_c, bias_init=1): y = style @ (w/sqrt(d)).T + b
    s = style @ (torch.from_numpy(mod_w) / math.sqrt(style_dim)) + torch.from_numpy(
        mod_b
    )
    scale = 1.0 / math.sqrt(in_c * k * k)
    weight = scale * w[None] * s.view(B, 1, in_c, 1, 1)
    if demodulate:
        demod = torch.rsqrt(weight.pow(2).sum([2, 3, 4]) + 1e-8)
        weight = weight * demod.view(B, out_c, 1, 1, 1)

    kfir = np.asarray(make_kernel(list(blur_kernel)))

    if up:
        wt = weight.transpose(1, 2).reshape(B * in_c, out_c, k, k)
        y = F.conv_transpose2d(
            x.reshape(1, B * in_c, H, W), wt, stride=2, padding=0, groups=B
        )
        y = y.view(B, out_c, y.shape[2], y.shape[3])
        factor = 2
        p = (len(blur_kernel) - factor) - (k - 1)
        pad0 = (p + 1) // 2 + factor - 1
        pad1 = p // 2 + 1
        y = upfirdn2d_ref(
            _nhwc(y.numpy()), kfir * factor**2, pad=(pad0, pad1)
        )
        return y
    elif down:
        factor = 2
        p = (len(blur_kernel) - factor) + (k - 1)
        xb = upfirdn2d_ref(_nhwc(x.numpy()), kfir, pad=((p + 1) // 2, p // 2))
        xb = torch.from_numpy(_nchw(xb)).float()
        y = F.conv2d(
            xb.reshape(1, -1, xb.shape[2], xb.shape[3]),
            weight.view(B * out_c, in_c, k, k),
            stride=2,
            groups=B,
        )
        y = y.view(B, out_c, y.shape[2], y.shape[3])
        return _nhwc(y.numpy())
    else:
        y = F.conv2d(
            x.reshape(1, B * in_c, H, W),
            weight.view(B * out_c, in_c, k, k),
            padding=k // 2,
            groups=B,
        )
        y = y.view(B, out_c, y.shape[2], y.shape[3])
        return _nhwc(y.numpy())


@pytest.mark.parametrize("mode", ["plain", "up", "down"])
@pytest.mark.parametrize("demodulate", [True, False])
def test_modulated_conv_matches_reference(mode, demodulate):
    rng = np.random.RandomState(0)
    B, in_c, out_c, k, style_dim, H = 2, 6, 5, 3, 8, 8
    x = rng.randn(B, H, H, in_c).astype(np.float32)
    style = rng.randn(B, style_dim).astype(np.float32)

    m = ModulatedConv2d(
        out_c, k, style_dim, demodulate=demodulate,
        upsample=mode == "up", downsample=mode == "down",
    )
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(style))
    got = np.asarray(m.apply(params, jnp.asarray(x), jnp.asarray(style)))

    p = params["params"]
    w_hwio = np.asarray(p["weight"])  # (k,k,in,out)
    w_oikk = np.transpose(w_hwio, (3, 2, 0, 1)).copy()
    mod_w = np.asarray(p["modulation"]["weight"])  # (style_dim, in_c)
    mod_b = np.asarray(p["modulation"]["bias"])
    want = torch_modconv_oracle(
        _nchw(x), w_oikk, mod_w, mod_b, style, demodulate,
        up=mode == "up", down=mode == "down",
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_equal_linear_matches_reference():
    rng = np.random.RandomState(1)
    x = rng.randn(4, 16).astype(np.float32)
    m = EqualLinear(8, lr_mul=0.01, activation="fused_lrelu")
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    got = np.asarray(m.apply(params, jnp.asarray(x)))
    w = np.asarray(params["params"]["weight"])
    b = np.asarray(params["params"]["bias"])
    scale = (1 / math.sqrt(16)) * 0.01
    y = x @ (w * scale) + b * 0.01
    want = np.where(y >= 0, y, 0.2 * y) * math.sqrt(2)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_equal_conv2d_matches_torch():
    rng = np.random.RandomState(2)
    x = rng.randn(2, 9, 9, 4).astype(np.float32)
    m = EqualConv2d(6, 3, stride=2, padding=1)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    got = np.asarray(m.apply(params, jnp.asarray(x)))
    w = np.transpose(np.asarray(params["params"]["weight"]), (3, 2, 0, 1))
    b = np.asarray(params["params"]["bias"])
    scale = 1 / math.sqrt(4 * 9)
    want = F.conv2d(
        torch.from_numpy(_nchw(x)), torch.from_numpy(w * scale),
        bias=torch.from_numpy(b), stride=2, padding=1,
    ).numpy()
    np.testing.assert_allclose(got, _nhwc(want), rtol=1e-4, atol=1e-5)


def test_pixel_norm():
    x = np.random.RandomState(3).randn(4, 16).astype(np.float32)
    got = np.asarray(PixelNorm().apply({}, jnp.asarray(x)))
    want = x / np.sqrt((x**2).mean(-1, keepdims=True) + 1e-8)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_minibatch_stddev_matches_torch():
    rng = np.random.RandomState(4)
    x = rng.randn(8, 4, 4, 6).astype(np.float32)
    got = np.asarray(minibatch_stddev(jnp.asarray(x), 4, 1))
    # torch oracle (model.py:323-332 semantics)
    out = torch.from_numpy(_nchw(x))
    batch, channel, height, width = out.shape
    group = min(batch, 4)
    stddev = out.view(group, -1, 1, channel, height, width)
    stddev = torch.sqrt(stddev.var(0, unbiased=False) + 1e-8)
    stddev = stddev.mean([2, 3, 4], keepdim=True).squeeze(2)
    stddev = stddev.repeat(group, 1, height, width)
    want = _nhwc(torch.cat([out, stddev], 1).numpy())
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_conv_layer_and_resblock_shapes():
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(2, 16, 16, 8).astype(np.float32))
    m = ConvLayer(12, 3, downsample=True)
    params = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(params, x)
    assert y.shape == (2, 8, 8, 12)

    r = ResBlock(12)
    params = r.init(jax.random.PRNGKey(1), x)
    y = r.apply(params, x)
    assert y.shape == (2, 8, 8, 12)

    r2 = ResBlock(4, downsample=False)
    params = r2.init(jax.random.PRNGKey(2), x)
    y2 = r2.apply(params, x)
    assert y2.shape == (2, 16, 16, 4)
