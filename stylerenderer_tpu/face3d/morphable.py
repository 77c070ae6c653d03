"""Statistical 3D face geometry models: PCA (BFM), bilinear blendshapes
(FaceWarehouse), and linear-blend-skinning (FLAME).

Functional pytree re-design of reference ``face_model.py``. Each model is a
``flax.struct`` pytree with a uniform interface:

- ``dim``            — (shape_dim, pose/expression_dim, 3*nv) (static)
- ``random_input(rng, batch)`` -> parameter samples from the model prior
- ``__call__(x)``    -> vertices ``[B, nv, 3]``
- ``regulation(x)``  -> scalar prior energy

All three are pure jnp, fully jittable and differentiable — the 3DMM
parameters are optimization targets during face reconstruction (inversion).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from stylerenderer_tpu.face3d.transforms import rodrigues


@struct.dataclass
class LinearMorphableModel:
    """PCA morphable model: ``v = x @ basis + mean`` (face_model.py:4-74)."""

    basis: jnp.ndarray  # [D, 3nv]
    mean: jnp.ndarray  # [3nv]
    sigma: jnp.ndarray  # [D]
    shape_dim: int = struct.field(pytree_node=False)
    expression_dim: int = struct.field(pytree_node=False)

    @property
    def dim(self):
        return [self.shape_dim, self.expression_dim, self.mean.shape[-1]]

    def random_input(self, rng, batch_size: int = 1):
        return jax.random.normal(rng, (batch_size, self.sigma.shape[0])) * self.sigma

    def __call__(self, x):
        v = jnp.dot(x, self.basis) + self.mean
        return v.reshape(x.shape[0], -1, 3)

    def regulation(self, x):
        return jnp.sum((x / self.sigma[None, :]) ** 2)


def make_linear_morphable_model(
    vertices_num: int,
    shape_dim: int = 0,
    expression_dim: int = 0,
    vertices_mean=None,
    w_shape=None,
    w_expression=None,
    sigma_shape=1.0,
    sigma_expression=0.01,
    seed: int = 0,
) -> LinearMorphableModel:
    """Build a LinearMorphableModel, filling missing pieces with the
    reference's random-uniform initialization (face_model.py:16-19)."""
    rng = np.random.RandomState(seed)
    d = shape_dim + expression_dim
    mean = (rng.rand(vertices_num * 3).astype(np.float32) * 2 - 1) * np.sqrt(max(d, 1))
    basis = (rng.rand(d, vertices_num * 3).astype(np.float32) * 2 - 1) * np.sqrt(
        max(d, 1)
    )
    if vertices_mean is not None:
        vm = np.asarray(vertices_mean, np.float32)
        if vm.shape[0] == 3 and vm.ndim > 1:
            vm = vm.reshape(3, -1).T
        vm = vm.reshape(-1, 3)
        n = min(vertices_num, vm.shape[0])
        mean[: 3 * n] = vm[:n].reshape(-1)
    for w_in, off, dd in ((w_shape, 0, shape_dim), (w_expression, shape_dim, expression_dim)):
        if w_in is None or dd == 0:
            continue
        w_np = np.asarray(w_in, np.float32).reshape(-1, np.asarray(w_in).shape[-1])
        if w_np.shape[0] == basis.shape[1] and w_np.shape[1] >= dd:
            w_np = w_np.T
        k = min(dd, w_np.shape[0])
        n = min(vertices_num, w_np.shape[1] // 3)
        basis[off : off + k, : 3 * n] = w_np[:k, : 3 * n]

    def expand_sigma(s, d):
        s = np.abs(np.reshape(s, -1)) if s is not None else np.zeros(0)
        out = np.ones(d, np.float32)
        for i in range(d):
            out[i] = s[i] if len(s) > i else (s[-1] if len(s) else 1.0)
        return out

    sigma = np.concatenate(
        [expand_sigma(sigma_shape, shape_dim), expand_sigma(sigma_expression, expression_dim)]
    )
    return LinearMorphableModel(
        basis=jnp.asarray(basis),
        mean=jnp.asarray(mean),
        sigma=jnp.asarray(sigma),
        shape_dim=shape_dim,
        expression_dim=expression_dim,
    )


@struct.dataclass
class BlendShapeModel:
    """Bilinear id x expression blendshapes with simplex/sigmoid weights
    (face_model.py:75-146)."""

    weight: jnp.ndarray  # [S+1, E+1, 3nv]
    beta: jnp.ndarray  # [S+1 + 2E]
    shape_dim: int = struct.field(pytree_node=False)
    expression_dim: int = struct.field(pytree_node=False)

    @property
    def dim(self):
        return [self.shape_dim, self.expression_dim, self.weight.shape[-1]]

    def random_input(self, rng, batch_size: int = 1, eps: float = 1e-9):
        S, E = self.shape_dim, self.expression_dim
        r1, r2 = jax.random.split(rng)
        xs = jax.random.dirichlet(r1, self.beta[: S + 1], (batch_size,))
        xs = jnp.log(xs[:, :-1] / jnp.clip(xs[:, -1:], min=eps))
        ab = self.beta[S + 1 :].reshape(E, 2)
        xe = jax.random.beta(
            r2, ab[None, :, 0], ab[None, :, 1], (batch_size, E)
        )
        return jnp.concatenate(
            [xs - jnp.sum(xs, 1, keepdims=True) / S,
             jnp.log(xe / jnp.clip(1 - xe, min=eps))],
            axis=1,
        )

    def __call__(self, x):
        S, E = self.shape_dim, self.expression_dim
        xs = jax.nn.softmax(
            jnp.concatenate([x[:, :S], -jnp.sum(x[:, :S], 1, keepdims=True)], 1), -1
        )
        xe = jax.nn.sigmoid(x[:, S:])
        xe = jnp.concatenate([1 - jnp.sum(xe, 1, keepdims=True), xe], 1)
        mid = jnp.dot(xs, self.weight.reshape(S + 1, -1)).reshape(-1, E + 1, self.dim[2])
        v = jnp.einsum("be,bed->bd", xe, mid)
        return v.reshape(x.shape[0], -1, 3)

    def regulation(self, x):
        """Dirichlet/Beta log-prior energy (face_model.py:137-146)."""
        S = self.shape_dim
        xs = jnp.concatenate([x[:, :S], -jnp.sum(x[:, :S], 1, keepdims=True)], 1)
        xe = x[:, S:]
        alpha = self.beta[: S + 1]
        a_e = self.beta[S + 1 :].reshape(-1, 2)
        term_s = jnp.sum(xs * alpha[None, :]) - jnp.sum(
            jnp.log(jnp.sum(jnp.exp(xs), 1))
        ) * (jnp.sum(alpha) - S - 1)
        term_e = jnp.sum(xe * a_e[None, :, 0] - 1) - jnp.sum(
            jnp.log(jnp.exp(xe) + 1) * (jnp.sum(a_e, 1)[None, :] - 2)
        )
        return -(term_s + term_e)


def make_blendshape_model(
    vertices_num: int, shape_dim: int, expression_dim: int, bs=None,
    beta_shape=1.0, beta_expression=(1.0, 10.0), seed: int = 0,
) -> BlendShapeModel:
    rng = np.random.RandomState(seed)
    w = (
        rng.rand(shape_dim + 1, expression_dim + 1, vertices_num * 3).astype(np.float32)
        * 2 - 1
    ) * np.sqrt(max(shape_dim + expression_dim, 1))
    if bs is not None:
        bs = np.asarray(bs, np.float32).reshape(
            np.asarray(bs).shape[0], np.asarray(bs).shape[1], -1
        )
        d0 = min(bs.shape[0], w.shape[0])
        d1 = min(bs.shape[1], w.shape[1])
        d2 = min((bs.shape[2] // 3) * 3, w.shape[2])
        w[:d0, :d1, :d2] = bs[:d0, :d1, :d2]
    bsh = np.abs(np.reshape(beta_shape, -1))
    bex = np.abs(np.reshape(beta_expression, -1))
    beta = np.concatenate(
        [
            np.array([bsh[i] if len(bsh) > i else (bsh[-1] if len(bsh) else 1.0)
                      for i in range(shape_dim + 1)], np.float32),
            np.array(
                [
                    bex[2 * i + j] if len(bex) > 2 * i + 1 else
                    (bex[j - 2] if len(bex) > 1 else 1.0)
                    for i in range(expression_dim) for j in range(2)
                ],
                np.float32,
            ),
        ]
    )
    return BlendShapeModel(
        weight=jnp.asarray(w), beta=jnp.asarray(beta),
        shape_dim=shape_dim, expression_dim=expression_dim,
    )


@struct.dataclass
class LinearBlendSkinningModel:
    """SMPL/FLAME-style LBS: shape blendshapes + pose-corrective blendshapes
    + forward kinematics + skinning (face_model.py:147-341), row-vector
    convention (``p' = p @ R + t``)."""

    shapedirs: jnp.ndarray  # [S, 3nv]
    posedirs: jnp.ndarray  # [(J-1)*9, 3nv]
    v_template: jnp.ndarray  # [3nv]
    lbs_weights: jnp.ndarray  # [nv, J]
    j_regressor: jnp.ndarray  # [J, nv]
    sigma: jnp.ndarray  # [S + (J-1)*3]
    pose_mean: jnp.ndarray  # [(J-1)*3]
    pose_cov: jnp.ndarray  # [J-1, 3, 3]
    parents: Any = struct.field(pytree_node=False)  # tuple[int], len J-1
    shape_dim: int = struct.field(pytree_node=False)

    @property
    def dim(self):
        return [self.shape_dim, len(self.parents) * 3, self.v_template.shape[-1]]

    def random_input(self, rng, batch_size: int = 1):
        x = jax.random.normal(rng, (batch_size, self.sigma.shape[0])) * self.sigma
        pose = x[:, self.shape_dim :].reshape(batch_size, -1, 3)
        pose = jnp.einsum("bji,jik->bjk", pose, self.pose_cov) + self.pose_mean.reshape(
            1, -1, 3
        )
        return jnp.concatenate([x[:, : self.shape_dim], pose.reshape(batch_size, -1)], 1)

    def __call__(self, x):
        B = x.shape[0]
        S = self.shape_dim
        nj = len(self.parents) + 1
        nv = self.v_template.shape[-1] // 3
        v_shaped = jnp.dot(x[:, :S], self.shapedirs) + self.v_template
        v_shaped3 = v_shaped.reshape(B, nv, 3)
        R = rodrigues(x[:, S:].reshape(B, -1, 3))  # [B, J-1, 3, 3]
        J3 = jnp.einsum("jn,bnk->bjk", self.j_regressor, v_shaped3)  # [B, J, 3]
        v_posed = (
            jnp.dot(
                (R - jnp.eye(3)).reshape(B, -1), self.posedirs
            )
            + v_shaped
        ).reshape(B, nv, 3)
        # forward kinematics, root first (face_model.py:323-330)
        rots = [jnp.tile(jnp.eye(3, dtype=x.dtype)[None], (B, 1, 1))]
        trans = [J3[:, 0]]
        for i, p in enumerate(self.parents):
            child = i + 1
            rots.append(jnp.einsum("bij,bjk->bik", R[:, i].transpose(0, 2, 1), rots[p]))
            trans.append(
                jnp.einsum("bk,bkj->bj", J3[:, child] - J3[:, p], rots[p]) + trans[p]
            )
        Rg = jnp.stack(rots, 1)  # [B, J, 3, 3]
        Tg = jnp.stack(trans, 1)  # [B, J, 3]
        # skinning (face_model.py:331-334)
        vj = jnp.einsum("bnk,bjkl->bjnl", v_posed, Rg) - jnp.einsum(
            "bjk,bjkl->bjl", J3, Rg
        )[:, :, None, :] + Tg[:, :, None, :]
        return jnp.einsum("nj,bjnk->bnk", self.lbs_weights, vj)

    def regulation(self, x):
        S = self.shape_dim
        l_shape = jnp.sum((x[:, :S] / self.sigma[None, :S]) ** 2)
        pose = x[:, S:].reshape(x.shape[0], -1, 3)
        pose_inv = jnp.linalg.inv(self.pose_cov)
        proj = jnp.einsum("bji,jik->bjk", pose, pose_inv)
        return l_shape + jnp.sum(proj**2)


def make_lbs_model(
    vertices_num: int, pose_nodes: int, shape_dim: int,
    v_template=None, j_regressor=None, parents=None, weights=None,
    posedirs=None, shapedirs=None, sigma_shape=1.0, sigma_pose=1.0,
    mean_pose=0.0, seed: int = 0,
) -> LinearBlendSkinningModel:
    rng = np.random.RandomState(seed)
    nj = max(pose_nodes, 1)
    scale = np.sqrt(shape_dim + (nj - 1) * 9)
    vt = (rng.rand(vertices_num * 3).astype(np.float32) * 2 - 1) * scale
    sd = (rng.rand(shape_dim, vertices_num * 3).astype(np.float32) * 2 - 1) * scale
    pd = (rng.rand((nj - 1) * 9, vertices_num * 3).astype(np.float32) * 2 - 1) * scale
    jr = (rng.rand(nj, vertices_num).astype(np.float32) * 2 - 1) * np.sqrt(nj)
    if v_template is not None:
        v_np = np.asarray(v_template, np.float32).reshape(-1, 3)
        n = min(vertices_num, v_np.shape[0])
        vt[: 3 * n] = v_np[:n].reshape(-1)
    if shapedirs is not None:
        s_np = np.asarray(shapedirs, np.float32).reshape(-1, np.asarray(shapedirs).shape[-1])
        if s_np.shape[0] == vertices_num * 3 and s_np.shape[1] >= shape_dim:
            s_np = s_np.T
        d = min(shape_dim, s_np.shape[0])
        sd[:d] = s_np[:d, : vertices_num * 3]
    if posedirs is not None:
        p_np = np.asarray(posedirs, np.float32).reshape(-1, np.asarray(posedirs).shape[-1])
        if p_np.shape[0] == vertices_num * 3 and p_np.shape[1] >= (nj - 1) * 9:
            p_np = p_np.T
        d = min((nj - 1) * 9, p_np.shape[0])
        pd[:d] = p_np[:d, : vertices_num * 3]
    if j_regressor is not None:
        j_np = np.asarray(j_regressor, np.float32)
        if j_np.shape[0] != nj:
            j_np = j_np.T
        jr[: j_np.shape[0], : j_np.shape[1]] = j_np[:nj, :vertices_num]
    if parents is None:
        parents = tuple(0 for _ in range(nj - 1))
    else:
        parents = tuple(int(p) for p in parents)
    if weights is not None:
        w_np = np.asarray(weights, np.float32)
        if w_np.shape[0] == nj and w_np.shape[1] >= vertices_num:
            w_np = w_np.T
        w = np.zeros((vertices_num, nj), np.float32)
        w[: w_np.shape[0], : w_np.shape[1]] = w_np[:vertices_num, :nj]
    else:
        # nearest-joint soft assignment (face_model.py:246-252)
        J = jr.dot(vt.reshape(-1, 3))
        d2 = ((vt.reshape(-1, 3)[:, None] - J[None]) ** 2).sum(-1)
        idx = d2.argmin(1)
        w = np.zeros((vertices_num, nj), np.float32)
        dmax2 = d2.max() if d2.size else 1.0
        w[np.arange(vertices_num), idx] = np.exp(-d2[np.arange(vertices_num), idx] / dmax2)
    w = np.abs(w)
    w = w / np.maximum(w.sum(1, keepdims=True), 1e-5)

    def expand(s, d, default=1.0):
        s = np.abs(np.reshape(s, -1)) if s is not None else np.zeros(0)
        return np.array(
            [s[i] if len(s) > i else (s[-1] if len(s) else default) for i in range(d)],
            np.float32,
        )

    sigma = np.concatenate([expand(sigma_shape, shape_dim), np.ones((nj - 1) * 3, np.float32)])
    mp = expand(mean_pose, nj - 1, 0.0) if np.size(mean_pose) <= nj - 1 else expand(
        mean_pose, (nj - 1) * 3, 0.0
    )
    if mp.shape[0] == nj - 1:
        mp = np.repeat(mp, 3)
    sp = np.abs(np.reshape(sigma_pose, -1))
    if len(sp) <= nj - 1:
        cov = np.stack(
            [
                (sp[i] if len(sp) > i else (sp[-1] if len(sp) else 1.0)) * np.eye(3)
                for i in range(nj - 1)
            ]
        ).astype(np.float32)
    elif len(sp) <= (nj - 1) * 3:
        vals = expand(sigma_pose, (nj - 1) * 3)
        cov = np.stack([np.diag(vals[3 * i : 3 * i + 3]) for i in range(nj - 1)]).astype(
            np.float32
        )
    else:
        vals = expand(sigma_pose, (nj - 1) * 9)
        cov = vals.reshape(nj - 1, 3, 3).astype(np.float32)
    return LinearBlendSkinningModel(
        shapedirs=jnp.asarray(sd),
        posedirs=jnp.asarray(pd),
        v_template=jnp.asarray(vt),
        lbs_weights=jnp.asarray(w),
        j_regressor=jnp.asarray(jr),
        sigma=jnp.asarray(sigma),
        pose_mean=jnp.asarray(mp),
        pose_cov=jnp.asarray(cov),
        parents=parents,
        shape_dim=shape_dim,
    )
