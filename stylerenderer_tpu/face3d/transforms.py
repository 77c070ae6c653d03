"""3D transform builders: translation/rotation/scale/euler/rodrigues.

Functional jnp re-design of reference ``utils_3d.py:8-154``. The reference
hand-writes the Rodrigues VJP (utils_3d.py:81-154); here the closed form with
small-angle series is written so JAX autodiff produces correct gradients at
any order (the series keeps it smooth through r -> 0).
"""

from __future__ import annotations

import jax.numpy as jnp


def translate_mat(t):
    """[..., n] translation -> [..., n+1, n+1] homogeneous matrix, laid out
    for *row-vector* composition: ``p_h @ T`` (reference utils_3d.py:8-24
    builds the transpose of the usual column convention)."""
    t = jnp.asarray(t)
    single = t.ndim == 1
    if single:
        t = t[None]
    b, n = t.shape
    mat = jnp.tile(jnp.eye(n + 1, dtype=t.dtype), (b, 1, 1))
    mat = mat.at[:, n, :n].set(t)
    return mat[0] if single else mat


def rotate_mat(theta):
    """Rotation about the image z-axis: [...,] angle -> [..., 3, 3]."""
    theta = jnp.asarray(theta)
    c, s = jnp.cos(theta), jnp.sin(theta)
    o = jnp.zeros_like(c)
    i = jnp.ones_like(c)
    rows = jnp.stack([c, -s, o, s, c, o, o, o, i], axis=-1)
    return rows.reshape(theta.shape + (3, 3))


def scale_mat(s, dim: int | None = None):
    """Per-axis (or isotropic if ``dim`` given) scale -> homogeneous diag."""
    s = jnp.asarray(s)
    if dim is not None and dim > 0:
        s = jnp.broadcast_to(s[..., None], s.shape + (dim,))
    ones = jnp.ones(s.shape[:-1] + (1,), s.dtype)
    return _diag_embed(jnp.concatenate([s, ones], -1))


def _diag_embed(d):
    n = d.shape[-1]
    return d[..., :, None] * jnp.eye(n, dtype=d.dtype)


def euler_mat(angle, order: str = "yxz"):
    """Euler angles [..., 3] -> rotation [..., 3, 3], composing R3@R2@R1 for
    the given axis order (reference utils_3d.py:43-80)."""
    angle = jnp.asarray(angle)
    single = angle.ndim == 1
    if single:
        angle = angle[None]
    c = jnp.cos(angle)
    s = jnp.sin(angle)
    one = jnp.ones_like(c[:, 0])
    zero = jnp.zeros_like(c[:, 0])
    T = None
    for i in range(3):
        ci, si = c[:, i], s[:, i]
        ax = order[i].lower()
        if ax == "x":
            R = jnp.stack(
                [one, zero, zero, zero, ci, -si, zero, si, ci], -1
            ).reshape(-1, 3, 3)
        elif ax == "y":
            R = jnp.stack(
                [ci, zero, si, zero, one, zero, -si, zero, ci], -1
            ).reshape(-1, 3, 3)
        elif ax == "z":
            R = jnp.stack(
                [ci, -si, zero, si, ci, zero, zero, zero, one], -1
            ).reshape(-1, 3, 3)
        else:
            continue
        T = R if T is None else jnp.einsum("bij,bjk->bik", R, T)
    return T[0] if single else T


def rodrigues(rvec, eps: float = 1e-8):
    """Axis-angle [..., 3] -> rotation matrix [..., 3, 3].

    R = cos(r) I + (1-cos r)/r^2 * rr^T + sin(r)/r * [r]_x, with Taylor
    series below ``eps`` so the function (and its autodiff derivatives of any
    order) are smooth at r=0.
    """
    rvec = jnp.asarray(rvec)
    single = rvec.ndim == 1
    if single:
        rvec = rvec[None]
    r2 = jnp.sum(rvec * rvec, -1)
    small = r2 <= eps * eps
    # guard the sqrt so its gradient at 0 is finite; the series branch is used there
    r2_safe = jnp.where(small, 1.0, r2)
    r = jnp.sqrt(r2_safe)
    c = jnp.where(small, 1.0 - r2 / 2 + r2 * r2 / 24, jnp.cos(r))
    sc = jnp.where(small, 1.0 - r2 / 6, jnp.sin(r) / r)
    cc = jnp.where(small, 0.5 - r2 / 24, (1.0 - jnp.cos(r)) / r2_safe)
    rr = rvec[..., :, None] * rvec[..., None, :]
    zero = jnp.zeros_like(rvec[..., 0])
    rx = jnp.stack(
        [
            zero, -rvec[..., 2], rvec[..., 1],
            rvec[..., 2], zero, -rvec[..., 0],
            -rvec[..., 1], rvec[..., 0], zero,
        ],
        -1,
    ).reshape(rvec.shape[:-1] + (3, 3))
    eye = jnp.eye(3, dtype=rvec.dtype)
    R = (
        c[..., None, None] * eye
        + cc[..., None, None] * rr
        + sc[..., None, None] * rx
    )
    return R[0] if single else R
