"""upfirdn2d vs an independent numpy oracle and vs torch-computed goldens.

The oracle (``upfirdn2d_ref``) implements the reference semantics
(zero-stuff -> pad/crop -> convolve -> decimate) directly from the definition;
a second cross-check reproduces the reference's torch CPU fallback
(``/root/reference/op/upfirdn2d.py:159-200``) semantics via torch convs.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from stylerenderer_tpu.ops.upfirdn2d import (
    upfirdn2d,
    upfirdn2d_ref,
    make_kernel,
    upsample2d,
    downsample2d,
    blur,
)


def _rand(shape, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randn(*shape).astype(np.float32)


CASES = [
    # (in_h, in_w, kh, kw, up, down, pad)
    (8, 8, 4, 4, 1, 1, (1, 2)),
    (8, 8, 4, 4, 2, 1, (2, 1)),
    (8, 8, 4, 4, 1, 2, (1, 1)),
    (7, 9, 3, 5, 2, 1, (2, 2)),
    (6, 6, 3, 3, 1, 1, (-1, -1)),  # negative pad = crop
    (8, 8, 4, 4, 2, 2, (1, 1)),
    (5, 5, 2, 2, 3, 1, (1, 0)),
    (12, 10, 4, 4, 1, 3, (2, 1)),
    (8, 8, 4, 4, 2, 1, (2, -1)),  # mixed sign pads
]


@pytest.mark.parametrize("case", CASES)
def test_matches_numpy_oracle(case):
    in_h, in_w, kh, kw, up, down, pad = case
    x = _rand((2, in_h, in_w, 3))
    k = _rand((kh, kw), seed=1)
    got = np.asarray(upfirdn2d(jnp.asarray(x), jnp.asarray(k), up, down, pad))
    want = upfirdn2d_ref(x, k, up, down, pad)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_matches_torch_semantics():
    """Independent cross-check against torch: zero-stuff + F.pad + F.conv2d
    with flipped kernel + strided slice — the reference fallback's recipe,
    re-derived here (not copied)."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    x = _rand((2, 9, 7, 3))
    k = _rand((4, 3), seed=2)
    up, down, pad = 2, 2, (1, 2)

    xt = torch.from_numpy(x).permute(0, 3, 1, 2).reshape(-1, 1, 9, 7)
    stuffed = torch.zeros(6, 1, 18, 14)
    stuffed[:, :, ::up, ::up] = xt
    padded = F.pad(stuffed, [pad[0], pad[1], pad[0], pad[1]])
    w = torch.from_numpy(np.ascontiguousarray(k[::-1, ::-1])).view(1, 1, 4, 3)
    out = F.conv2d(padded, w)[:, :, ::down, ::down]
    want = out.reshape(2, 3, out.shape[2], out.shape[3]).permute(0, 2, 3, 1).numpy()

    got = np.asarray(upfirdn2d(jnp.asarray(x), jnp.asarray(k), up, down, pad))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_make_kernel():
    k = make_kernel([1, 3, 3, 1])
    assert k.shape == (4, 4)
    np.testing.assert_allclose(float(jnp.sum(k)), 1.0, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(k), np.outer([1, 3, 3, 1], [1, 3, 3, 1]) / 64.0, rtol=1e-6
    )


def test_upsample_downsample_roundtrip_shapes():
    x = _rand((1, 16, 16, 4))
    k = make_kernel([1, 3, 3, 1])
    up = upsample2d(jnp.asarray(x), k, 2)
    assert up.shape == (1, 32, 32, 4)
    down = downsample2d(jnp.asarray(x), k, 2)
    assert down.shape == (1, 8, 8, 4)


def test_blur_identity_kernel():
    x = _rand((1, 8, 8, 2))
    k = jnp.ones((1, 1), jnp.float32)
    out = blur(jnp.asarray(x), k, pad=(0, 0))
    np.testing.assert_allclose(np.asarray(out), x, rtol=1e-6)


def test_grad_flows():
    import jax

    x = jnp.asarray(_rand((1, 8, 8, 2)))
    k = make_kernel([1, 3, 3, 1])

    def f(x):
        return jnp.sum(upfirdn2d(x, k, up=2, down=1, pad=(2, 1)) ** 2)

    g = jax.grad(f)(x)
    assert g.shape == x.shape
    assert np.isfinite(np.asarray(g)).all()
    # numeric check on a few coordinates
    eps = 1e-3
    for idx in [(0, 0, 0, 0), (0, 3, 4, 1), (0, 7, 7, 0)]:
        xp = x.at[idx].add(eps)
        xm = x.at[idx].add(-eps)
        num = (f(xp) - f(xm)) / (2 * eps)
        np.testing.assert_allclose(float(g[idx]), float(num), rtol=2e-2, atol=1e-3)
