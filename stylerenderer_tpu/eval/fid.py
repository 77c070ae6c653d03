"""FID: feature statistics + Fréchet distance (reference ``fid.py`` /
``calc_inception.py`` semantics, jit-batched feature extraction)."""

from __future__ import annotations

import pickle

import jax
import jax.numpy as jnp
import numpy as np


def frechet_distance(mu1, cov1, mu2, cov2, eps: float = 1e-6):
    """d² = |mu1-mu2|² + tr(C1 + C2 - 2 sqrt(C1·C2)), with the reference's
    singular-offset fallback (fid.py:30-45)."""
    import scipy.linalg

    mu1, mu2 = np.asarray(mu1), np.asarray(mu2)
    cov1, cov2 = np.asarray(cov1), np.asarray(cov2)
    cc = scipy.linalg.sqrtm(cov1 @ cov2)
    if not np.isfinite(cc).all():
        offset = np.eye(cov1.shape[0]) * eps
        cc = scipy.linalg.sqrtm((cov1 + offset) @ (cov2 + offset))
    if np.iscomplexobj(cc):
        cc = cc.real
    mean_norm = np.sum((mu1 - mu2) ** 2)
    return float(mean_norm + np.trace(cov1) + np.trace(cov2) - 2 * np.trace(cc))


def feature_stats(feats):
    """(mean [D], cov [D, D]) of feature rows."""
    feats = np.asarray(feats, np.float64)
    mu = feats.mean(0)
    cov = np.cov(feats, rowvar=False)
    return mu, cov


def extract_features_from_samples(
    sample_fn, inception_apply, n_samples: int, batch: int, rng
):
    """Generate ``n_samples`` images via ``sample_fn(rng, batch)`` and return
    their pool3 features (fid.py:15-28 semantics)."""
    n_batches = n_samples // batch
    resid = n_samples - n_batches * batch
    feats = []
    for i in range(n_batches + (1 if resid else 0)):
        rng, k = jax.random.split(rng)
        b = batch if i < n_batches else resid
        imgs = sample_fn(k, batch)  # fixed batch for jit; slice residual
        f = inception_apply(imgs)
        feats.append(np.asarray(f[:b]))
    return np.concatenate(feats, 0)[:n_samples]


def extract_features_from_dataset(iterator, inception_apply, n_samples=None):
    """Pool3 features over a dataset iterator of [B,H,W,3] float batches in
    [-1, 1] (calc_inception.py:55-107 semantics)."""
    feats = []
    total = 0
    for imgs in iterator:
        f = np.asarray(inception_apply(jnp.asarray(imgs)))
        feats.append(f)
        total += f.shape[0]
        if n_samples is not None and total >= n_samples:
            break
    feats = np.concatenate(feats, 0)
    return feats[:n_samples] if n_samples else feats


def save_stats(path: str, mu, cov, meta=None):
    with open(path, "wb") as f:
        pickle.dump({"mean": np.asarray(mu), "cov": np.asarray(cov), "meta": meta}, f)


def load_stats(path: str):
    with open(path, "rb") as f:
        d = pickle.load(f)
    return d["mean"], d["cov"]


def compute_fid(sample_feats, real_mu, real_cov):
    mu, cov = feature_stats(sample_feats)
    return frechet_distance(mu, cov, real_mu, real_cov)
