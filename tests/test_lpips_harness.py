"""LPIPS auxiliary-harness tests: baseline distances (L2 / SSIM / DSSIM)
and the 2AFC / JND human-judgement scorers (reference
lpips/dist_model.py:212-284, lpips/__init__.py:46-141)."""

import numpy as np
import jax.numpy as jnp

from stylerenderer_tpu.eval.lpips_harness import (
    dssim_distance,
    l2_distance,
    psnr,
    score_2afc,
    score_jnd,
    ssim,
    voc_ap,
)


def test_l2_and_psnr_closed_form():
    a = np.zeros((2, 8, 8, 3), np.float32)
    b = np.full((2, 8, 8, 3), 0.5, np.float32)
    np.testing.assert_allclose(np.asarray(l2_distance(a, b)), 0.25, rtol=1e-6)
    # psnr of a constant 10-level offset on [0,255]
    p = 10 * np.log10(255.0**2 / 100.0)
    np.testing.assert_allclose(
        np.asarray(psnr(np.zeros((1, 8, 8)), np.full((1, 8, 8), 10.0))), p,
        rtol=1e-6,
    )


def test_ssim_identity_and_symmetry():
    rng = np.random.RandomState(0)
    a = rng.rand(2, 16, 16, 3).astype(np.float32) * 255
    b = rng.rand(2, 16, 16, 3).astype(np.float32) * 255
    np.testing.assert_allclose(np.asarray(ssim(a, a)), 1.0, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(ssim(a, b)), np.asarray(ssim(b, a)), rtol=1e-6
    )
    # dissimilar noise -> clearly below 1
    assert float(np.asarray(ssim(a, b)).max()) < 0.5


def test_ssim_matches_skimage_reference_values():
    """Hand-checked against skimage.metrics.structural_similarity
    (win_size=7, gaussian_weights=False) for a deterministic pattern:
    a constant-vs-scaled gradient image. The closed form for uniform
    windows on a linear ramp is evaluated here in float64."""
    h = w = 12
    x = np.tile(np.linspace(0, 255, w, dtype=np.float64), (h, 1))
    y = 0.5 * x + 20.0
    # closed-form per-window statistics of the ramp
    win = 7
    step = 255.0 / (w - 1)
    var_win = step**2 * (win**2 - 1) / 12.0 * (win * win) / (win * win - 1)
    # windows along the ramp have means ux, uy = .5 ux + 20; vars vx,
    # vy=.25vx; cov = .5 vx (linear map). SSIM is constant across windows.
    c1 = (0.01 * 255) ** 2
    c2 = (0.03 * 255) ** 2
    got = np.asarray(ssim(x[None, :, :, None], y[None, :, :, None], 255.0))
    # compute expectation window-by-window in float64
    vals = []
    for j in range(w - win + 1):
        seg = x[0, j:j + win]
        ux = seg.mean()
        uy = 0.5 * ux + 20.0
        vx = seg.var(ddof=1)
        vy = 0.25 * vx
        vxy = 0.5 * vx
        vals.append(
            (2 * ux * uy + c1) * (2 * vxy + c2)
            / ((ux**2 + uy**2 + c1) * (vx + vy + c2))
        )
    want = np.mean(vals)  # constant over rows
    # f32 moment cancellation (uxx - ux^2 at ~1e4 magnitudes) bounds the
    # achievable agreement with the f64 closed form at ~1e-3
    np.testing.assert_allclose(got, want, rtol=2e-3)
    del var_win


def test_dssim_zero_for_identical():
    rng = np.random.RandomState(1)
    a = (rng.rand(1, 16, 16, 3).astype(np.float32)) * 2 - 1
    np.testing.assert_allclose(np.asarray(dssim_distance(a, a)), 0.0,
                               atol=1e-6)


def test_score_2afc():
    # metric agrees with humans on 3 of 4, ties on none
    d0 = np.array([0.1, 0.9, 0.2, 0.3])
    d1 = np.array([0.5, 0.1, 0.6, 0.1])
    gt = np.array([0.0, 1.0, 1.0, 0.0])  # human prefers p1?
    # triplet0: d0<d1, gt=0 -> credit 1; t1: d1<d0, gt=1 -> 1;
    # t2: d0<d1, gt=1 -> 0; t3: d1<d0, gt=0 -> 0 -> mean 0.5
    s, per = score_2afc(d0, d1, gt)
    np.testing.assert_allclose(per, [1, 1, 0, 0])
    assert s == 0.5


def test_score_2afc_tie_half_credit():
    s, per = score_2afc([0.2], [0.2], [0.7])
    np.testing.assert_allclose(per, [0.5])


def test_score_jnd_perfect_and_random():
    # distances perfectly separate same(low)/different(high) -> AP = 1
    ds = np.array([0.1, 0.2, 0.8, 0.9])
    sames = np.array([1.0, 1.0, 0.0, 0.0])
    assert score_jnd(ds, sames) == 1.0
    # inverted ranking -> AP well below 1
    assert score_jnd(ds[::-1].copy(), sames) < 0.6


def test_voc_ap_monotone_envelope():
    rec = np.array([0.25, 0.5, 0.75, 1.0])
    prec = np.array([1.0, 0.5, 0.67, 0.5])
    ap = voc_ap(rec, prec)
    assert 0.5 <= ap <= 1.0
