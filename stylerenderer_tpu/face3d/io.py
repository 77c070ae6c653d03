"""Face model loaders (BFM / FaceWarehouse / FLAME) and synthetic stand-ins.

Loader semantics follow reference ``face_model.py:342-408``; all host-side
numpy/scipy, producing the functional pytree models in ``morphable.py``.
``synthetic_face`` builds a BFM-shaped random model + sphere-face mesh for
tests and benchmarks when no real 3DMM asset is present.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from stylerenderer_tpu.face3d.morphable import (
    make_blendshape_model,
    make_lbs_model,
    make_linear_morphable_model,
)


def load_bfm(file_name="/data/BaselFaceModel.mat"):
    """Basel Face Model .mat -> (LinearMorphableModel, tri). face_model.py:342-362."""
    if isinstance(file_name, str):
        import scipy.io as sio

        data = sio.loadmat(file_name)
    else:
        data = file_name
    v = np.asarray(data["v"], np.float64)
    v = (v - v.mean(1).reshape(-1, 1)).T * 1e-5
    w_shape = np.asarray(data["w_shape"]) * 1e-5
    w_exp = np.asarray(data["w_exp"]) * 1e-5
    if "sigma_shape" in data:
        w_shape = w_shape.dot(np.diag(np.asarray(data["sigma_shape"]).reshape(-1)))
    if "sigma_exp" in data:
        w_exp = w_exp.dot(np.diag(np.asarray(data["sigma_exp"]).reshape(-1)))
    tri = np.asarray(data["tri"][0, 0] if data["tri"].dtype == object else data["tri"])
    tri = (tri - tri.min()).astype(np.int32)
    if tri.shape[0] == 3 and tri.shape[1] != 3:
        tri = tri.T
    model = make_linear_morphable_model(
        len(v), w_shape.shape[1], w_exp.shape[1], v, w_shape, w_exp
    )
    return model, jnp.asarray(tri)


def load_bfm_texture(file_name) -> np.ndarray | None:
    """Per-vertex mean-face texture from a BFM .mat ([nv, 3] in [0, 255]),
    used by the render-and-detect canonical alignment reference
    (reference utils_face.py:488,516-518). None if the file ships none."""
    if isinstance(file_name, str):
        import scipy.io as sio

        data = sio.loadmat(file_name)
    else:
        data = file_name
    if "tex" not in data:
        return None
    tex = np.asarray(data["tex"], np.float32)
    if tex.shape[0] == 3 and tex.shape[1] != 3:
        tex = tex.T
    return tex


def load_facewarehouse(file_name="/data/FaceWareHouse.mat"):
    """FaceWarehouse bilinear tensor -> (BlendShapeModel, tri). face_model.py:363-377."""
    if isinstance(file_name, str):
        import scipy.io as sio

        data = sio.loadmat(file_name)
    else:
        data = file_name
    v = np.asarray(data["v"])
    p = np.asarray(data["p"])
    v_mean = np.tile(v.mean(1).reshape(-1, 1, 1), (v.shape[1], 1, 1))
    bs = np.transpose(p - v_mean, (2, 1, 0))
    tri = (np.asarray(data["tri"]) - np.asarray(data["tri"]).min()).astype(np.int32)
    if tri.shape[0] == 3 and tri.shape[1] != 3:
        tri = tri.T
    model = make_blendshape_model(
        v.shape[1], bs.shape[0] - 1, bs.shape[1] - 1, bs, 0.01
    )
    return model, jnp.asarray(tri)


def _order_kintree(kintree, pose_nodes):
    """Reorder joints so every parent precedes its children; returns
    (parents_of_children, order). face_model.py:163-188 intent."""
    kt = np.asarray(kintree, np.int64)
    if kt.ndim == 1:
        if len(kt) == pose_nodes - 1:
            kt = np.concatenate([[-1], kt])
        kt = np.vstack([kt, np.arange(pose_nodes)])
    elif kt.shape[1] == 2 and kt.shape[0] == pose_nodes:
        kt = kt.T
    kt = kt.astype(np.int64)
    roots = list(kt[1, (kt[0] < 0) | (kt[0] >= pose_nodes)])
    order = list(roots)
    i = 0
    while len(order) < pose_nodes:
        order += list(kt[1, kt[0] == order[i]])
        i += 1
    inv = np.zeros(pose_nodes, np.int64)
    inv[np.asarray(order)] = np.arange(pose_nodes)
    parent_of = {int(c): int(p) for p, c in kt.T if 0 <= p < pose_nodes}
    parents = [int(inv[parent_of[int(order[k])]]) for k in range(len(roots), pose_nodes)]
    return parents, np.asarray(order)


def load_flame(file_name="/data/flame/generic_model.pkl"):
    """FLAME .pkl/.mat -> (LinearBlendSkinningModel, tri). face_model.py:378-408."""
    if isinstance(file_name, str):
        if file_name.endswith(".pkl"):
            import pickle

            with open(file_name, "rb") as f:
                data = pickle.load(f, encoding="latin1")
        else:
            import scipy.io as sio

            data = sio.loadmat(file_name)
    else:
        data = file_name
    v_template = np.asarray(data["v_template"])
    posedirs = np.asarray(data["posedirs"])
    shapedirs = np.asarray(data["shapedirs"])
    nj = posedirs.shape[-1] // 9 + 1
    nv = v_template.shape[0]
    parents, order = _order_kintree(data["kintree_table"], nj)
    jr = data["J_regressor"]
    try:
        import scipy.sparse as sp

        if sp.issparse(jr):
            jr = np.asarray(jr.todense())
        else:
            jr = np.asarray(jr)
    except ImportError:
        jr = np.asarray(jr)
    if jr.shape[0] != nj:
        jr = jr.T
    weights = np.asarray(data["weights"])
    if weights.shape[0] == nj:
        weights = weights.T
    # apply joint reordering
    jr = jr[order]
    weights = weights[:, order]
    pd = posedirs.reshape(-1, posedirs.shape[-1])
    pd = pd.reshape(nv * 3, nj - 1, 9)
    # posedirs columns follow the original child ordering (joints 1..nj-1);
    # remap to the new order (skip the root)
    new_children = [o for o in order if o != order[0]]
    col = np.asarray([o - 1 for o in new_children])
    pd = pd[:, col, :].reshape(nv * 3, (nj - 1) * 9)
    # FLAME per-joint pose sigmas in degrees (face_model.py:389-392)
    neck, jaw, eye = [10, 30, 5], [10, 1, 1], [10, 10, 1e-5]
    sigma_pose = [s * np.pi / 180 for s in neck + jaw + eye + eye]
    model = make_lbs_model(
        nv, nj, shapedirs.shape[-1],
        v_template=v_template, j_regressor=jr, parents=parents,
        weights=weights, posedirs=pd.T, shapedirs=shapedirs.reshape(-1, shapedirs.shape[-1]).T,
        sigma_shape=1.0, sigma_pose=sigma_pose,
    )
    tri = (np.asarray(data["f"]) - np.asarray(data["f"]).min()).astype(np.int32)
    if tri.shape[0] == 3 and tri.shape[1] != 3:
        tri = tri.T
    return model, jnp.asarray(tri)


def sphere_face_mesh(nu: int = 64, nv: int = 128, radius: float = 0.6):
    """A UV-sphere 'face' mesh (host numpy): verts [N,3], tri [M,3]."""
    th = np.linspace(1e-3, np.pi - 1e-3, nu)
    ph = np.linspace(0, 2 * np.pi, nv, endpoint=False)
    T, P = np.meshgrid(th, ph, indexing="ij")
    pts = np.stack(
        [radius * np.sin(T) * np.cos(P), radius * np.cos(T), radius * np.sin(T) * np.sin(P)],
        -1,
    ).reshape(-1, 3).astype(np.float32)
    idx = np.arange(nu * nv).reshape(nu, nv)
    tris = []
    for i in range(nu - 1):
        a = idx[i]
        b = np.roll(idx[i], -1)
        c = np.roll(idx[i + 1], -1)
        d = idx[i + 1]
        tris.append(np.stack([a, b, c], -1))
        tris.append(np.stack([a, c, d], -1))
    return pts, np.concatenate(tris).astype(np.int32)


def synthetic_face(
    nu: int = 64, nv: int = 128, shape_dim: int = 80, expression_dim: int = 29,
    seed: int = 0,
):
    """A BFM-shaped synthetic morphable model over a sphere-face mesh, for
    tests and benchmarks: mean = sphere, random smooth basis."""
    pts, tri = sphere_face_mesh(nu, nv)
    rng = np.random.RandomState(seed)
    n = pts.shape[0]
    d = shape_dim + expression_dim
    # smooth low-frequency basis: sinusoidal fields of the surface position
    # (random direction, frequency <= 3 cycles across the face) so sampled
    # shapes deform like faces, not white noise
    freqs = rng.uniform(0.5, 3.0, (d, 3)).astype(np.float32)
    phases = rng.uniform(0, 2 * np.pi, (d, 1)).astype(np.float32)
    dirs = rng.randn(d, 3).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    field = np.sin(pts @ (freqs.T * np.pi) + phases.T)  # [n, d]
    basis = (field.T[:, :, None] * dirs[:, None, :] * 0.05).astype(np.float32)
    basis = basis.reshape(d, -1)
    model = make_linear_morphable_model(
        n, shape_dim, expression_dim, pts, basis[:shape_dim], basis[shape_dim:]
    )
    return model, jnp.asarray(tri)
