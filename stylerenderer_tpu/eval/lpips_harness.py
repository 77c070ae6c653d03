"""LPIPS auxiliary harness: the baseline distances and human-judgement
scoring the vendored richzhang package ships alongside the learned metric
(reference ``lpips/dist_model.py:212-284``, ``lpips/__init__.py:46-141``,
``lpips/networks_basic.py`` L2/DSSIM FakeNets).

- ``l2_distance`` / ``dssim_distance``: the non-learned baseline "models"
  (RGB colorspace branch). DSSIM follows skimage's ``compare_ssim``
  semantics the reference calls (uniform 7x7 window, K1=.01, K2=.03,
  unbiased covariance, interior crop, per-channel average) on [0,255]
  images converted from the [-1,1] tensors.
- ``score_2afc``: fraction of triplets where the distance agrees with the
  human 2AFC judgement (ties count half) — dist_model.py:212-245.
- ``score_jnd``: mAP of same/different classification by distance
  (VOC-style AP over the precision-recall curve) — dist_model.py:247-284
  + ``voc_ap`` (lpips/__init__.py:118-141).

All batched jnp; the dataset iteration of the reference harness (2AFC/JND
folders) reduces to calling these on the stacked distances.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax import lax


def l2_distance(p0, p1):
    """Per-sample mean squared difference of [-1,1] images [B,H,W,C] -> [B]
    (networks_basic.py L2.forward, RGB branch)."""
    p0 = jnp.asarray(p0)
    p1 = jnp.asarray(p1)
    return jnp.mean((p0 - p1) ** 2, axis=(1, 2, 3))


def psnr(p0, p1, peak: float = 255.0):
    """lpips/__init__.py:49-50 on [0,255] images."""
    p0 = jnp.asarray(p0, jnp.float32)
    p1 = jnp.asarray(p1, jnp.float32)
    mse = jnp.mean((p0 - p1) ** 2, axis=tuple(range(1, p0.ndim)))
    return 10 * jnp.log10(peak**2 / jnp.maximum(mse, 1e-20))


def _ssim_single(x, y, data_range: float, win: int = 7,
                 k1: float = 0.01, k2: float = 0.03):
    """skimage.compare_ssim for one channel [B,H,W]: uniform win x win
    filter, unbiased covariance (NP/(NP-1)), mean over the interior crop.
    A VALID-window convolution IS the interior, so no crop is needed."""
    x = x[..., None]  # NHWC, C=1
    y = y[..., None]
    window = (1, win, win, 1)
    strides = (1, 1, 1, 1)
    np_ = float(win * win)
    cov_norm = np_ / (np_ - 1.0)

    def mean_valid(t):
        s = lax.reduce_window(t, 0.0, lax.add, window, strides, "VALID")
        return s / np_

    ux = mean_valid(x)
    uy = mean_valid(y)
    uxx = mean_valid(x * x)
    uyy = mean_valid(y * y)
    uxy = mean_valid(x * y)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / (
        (ux * ux + uy * uy + c1) * (vx + vy + c2)
    )
    return jnp.mean(s, axis=(1, 2, 3))


def ssim(p0, p1, data_range: float = 255.0):
    """Multichannel SSIM (per-channel average) of [B,H,W,C] images."""
    p0 = jnp.asarray(p0, jnp.float32)
    p1 = jnp.asarray(p1, jnp.float32)
    vals = [
        _ssim_single(p0[..., c], p1[..., c], data_range)
        for c in range(p0.shape[-1])
    ]
    return jnp.mean(jnp.stack(vals, -1), -1)


def dssim_distance(p0, p1):
    """networks_basic.py DSSIM FakeNet (RGB branch): images in [-1,1] are
    mapped to [0,255] (util.tensor2im) and scored (1 - ssim)/2."""
    a = (jnp.asarray(p0) + 1.0) * 127.5
    b = (jnp.asarray(p1) + 1.0) * 127.5
    return (1.0 - ssim(a, b, 255.0)) / 2.0


def score_2afc(d0s, d1s, gts):
    """(score, per-triplet scores). gts in [0,1] = fraction of humans
    preferring patch 1 (dist_model.py:239-244)."""
    d0s = np.asarray(d0s, np.float64)
    d1s = np.asarray(d1s, np.float64)
    gts = np.asarray(gts, np.float64)
    scores = (d0s < d1s) * (1.0 - gts) + (d1s < d0s) * gts + \
        (d1s == d0s) * 0.5
    return float(np.mean(scores)), scores


def voc_ap(rec, prec):
    """VOC AP (correct-integration variant, lpips/__init__.py:126-141)."""
    mrec = np.concatenate(([0.0], rec, [1.0]))
    mpre = np.concatenate(([0.0], prec, [0.0]))
    for i in range(mpre.size - 1, 0, -1):
        mpre[i - 1] = np.maximum(mpre[i - 1], mpre[i])
    i = np.where(mrec[1:] != mrec[:-1])[0]
    return float(np.sum((mrec[i + 1] - mrec[i]) * mpre[i + 1]))


def score_jnd(ds, sames):
    """mAP of same-pair detection ranked by ascending distance
    (dist_model.py:271-284)."""
    ds = np.asarray(ds, np.float64)
    sames = np.asarray(sames, np.float64)
    order = np.argsort(ds)
    sames_sorted = sames[order]
    TPs = np.cumsum(sames_sorted)
    FPs = np.cumsum(1 - sames_sorted)
    FNs = np.sum(sames_sorted) - TPs
    precs = TPs / np.maximum(TPs + FPs, 1e-12)
    recs = TPs / np.maximum(TPs + FNs, 1e-12)
    return voc_ap(recs, precs)
