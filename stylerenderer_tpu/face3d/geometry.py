"""Mesh geometry: per-vertex normals, rigid pose augmentation, OBJ export.

TPU-native re-design of reference ``utils_3d.py:360-444``: the torch.sparse
one-hot scatter for normal accumulation becomes ``jax.ops.segment_sum`` —
dense, deterministic, differentiable at any order.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from stylerenderer_tpu.face3d.transforms import euler_mat


def normalize(v, axis: int = -1, eps: float = 1e-8):
    """L2-normalize with the reference's clamped-norm semantics
    (layers.py:19-23: norm = max(||v||, eps)).

    The clamp sits INSIDE the sqrt — ``sqrt(max(n2, eps^2))`` equals
    ``max(sqrt(n2), eps)`` exactly, but d sqrt/dx -> inf at x=0 makes the
    naive form produce 0*inf = NaN gradients wherever the vector is exactly
    zero (e.g. a mesh vertex whose incident face normals cancel, or an
    unreferenced vertex under segment_sum) — inversion differentiates
    through ``mesh_point_normal`` every iteration, so the gradient must be
    finite everywhere (same fix class as eval/lpips.py::_unit_normalize)."""
    n2 = jnp.sum(v * v, axis=axis, keepdims=True)
    return v / jnp.sqrt(jnp.maximum(n2, eps * eps))


def mesh_point_normal(v, tri):
    """Area-weighted per-vertex normals (utils_3d.py:379-404).

    v: [B, nv, 3]; tri: [nf, 3] -> [B, nv, 3] unit normals.
    """
    v = jnp.asarray(v)
    tri = jnp.asarray(tri, jnp.int32)
    nv = v.shape[-2]
    va = v[..., tri[:, 0], :]
    vb = v[..., tri[:, 1], :]
    vc = v[..., tri[:, 2], :]
    fn = jnp.cross(vb - va, vc - va)  # [B, nf, 3] face normal * 2*area

    def scatter(b_fn):
        out = jnp.zeros((nv, 3), b_fn.dtype)
        for j in range(3):
            out = out + jax.ops.segment_sum(b_fn, tri[:, j], num_segments=nv)
        return out

    vn = jax.vmap(scatter)(fn) if v.ndim == 3 else scatter(fn)
    return normalize(vn)


def random_apply_pose3D(rng, v=None, p=(0.5, 0.1, 0.05, 0.1, 0.1, 0.1, 0.15)):
    """Random rigid transform of vertices (utils_3d.py:360-378).

    p = [yaw, pitch, roll, tx, ty, tz, log-scale] stddevs. Returns transformed
    vertices (or the [3, 4] transform if v is None).
    """
    p = jnp.abs(jnp.asarray(p, jnp.float32).reshape(-1)[:7])
    if p.shape[0] < 7:
        p = jnp.concatenate([p, jnp.zeros(7 - p.shape[0])])
    batch = v.shape[0] if (v is not None and v.ndim >= 3) else 1
    z = jax.random.normal(rng, (batch, 7)) * p[None, :]
    R = jnp.exp(z[:, -1])[:, None, None] * euler_mat(z[:, :3], "yxz")
    t = z[:, 3:6]
    if v is None:
        return jnp.concatenate([R[0], t[0][:, None]], axis=-1)
    # reference applies v @ R + t (row-vector convention, utils_3d.py:375)
    return jnp.einsum("bnk,bkj->bnj", v[..., :3], R) + t[:, None, :]


def save_obj(file_name, v, tri=(), vn=()):
    """Minimal OBJ writer (utils_3d.py:405-444, vertices/faces/normals)."""
    v = np.asarray(v)
    tri = np.asarray(tri) if len(tri) else np.zeros((0, 3), np.int64)
    vn = np.asarray(vn) if len(vn) else None
    with open(file_name, "w") as f:
        for p in v:
            f.write("v " + " ".join("%f" % x for x in p) + "\n")
        if vn is not None:
            for n in vn:
                f.write("vn " + " ".join("%f" % x for x in n[:3]) + "\n")
        for t in tri:
            if vn is not None:
                f.write("f " + " ".join("%d//%d" % (i + 1, i + 1) for i in t) + "\n")
            else:
                f.write("f " + " ".join("%d" % (i + 1) for i in t) + "\n")
    return os.path.exists(file_name)
