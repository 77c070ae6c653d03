"""face3d tests: rodrigues/euler vs scipy & torch-free oracles, mesh normals
vs a serial numpy oracle, morphable models (all three families), loaders on
synthetic data dicts, pose augmentation."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from stylerenderer_tpu.face3d import (
    euler_mat,
    load_bfm,
    load_facewarehouse,
    load_flame,
    make_blendshape_model,
    make_lbs_model,
    make_linear_morphable_model,
    mesh_point_normal,
    random_apply_pose3D,
    rodrigues,
    synthetic_face,
)


def test_rodrigues_matches_scipy():
    from scipy.spatial.transform import Rotation

    rng = np.random.RandomState(0)
    rv = rng.randn(8, 3).astype(np.float64)
    got = np.asarray(rodrigues(jnp.asarray(rv)))
    want = Rotation.from_rotvec(rv).as_matrix()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    # small-angle branch
    rv0 = np.array([[1e-9, -1e-9, 1e-10], [0.0, 0.0, 0.0]])
    got0 = np.asarray(rodrigues(jnp.asarray(rv0)))
    np.testing.assert_allclose(got0, np.tile(np.eye(3), (2, 1, 1)), atol=1e-7)


def test_rodrigues_grad_smooth_at_zero():
    g = jax.grad(lambda r: jnp.sum(rodrigues(r) ** 2))(jnp.zeros(3))
    assert np.isfinite(np.asarray(g)).all()
    gg = jax.hessian(lambda r: jnp.sum(rodrigues(r)[0, 1] ** 2))(jnp.zeros(3))
    assert np.isfinite(np.asarray(gg)).all()


def test_euler_mat_matches_scipy():
    from scipy.spatial.transform import Rotation

    rng = np.random.RandomState(1)
    ang = rng.randn(5, 3)
    got = np.asarray(euler_mat(jnp.asarray(ang), "yxz"))
    # our composition is R_z @ R_x @ R_y (applied y then x then z) ==
    # scipy extrinsic 'yxz' with angles in that order
    want = Rotation.from_euler("yxz", ang).as_matrix()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_mesh_point_normal_matches_serial():
    rng = np.random.RandomState(2)
    v = rng.randn(2, 10, 3).astype(np.float32)
    tri = rng.randint(0, 10, (12, 3)).astype(np.int32)
    got = np.asarray(mesh_point_normal(jnp.asarray(v), jnp.asarray(tri)))
    want = np.zeros_like(v)
    for b in range(2):
        acc = np.zeros((10, 3))
        for t in tri:
            a, bb, c = v[b, t[0]], v[b, t[1]], v[b, t[2]]
            fn = np.cross(bb - a, c - a)
            for j in t:
                acc[j] += fn
        nrm = np.maximum(np.linalg.norm(acc, axis=-1, keepdims=True), 1e-8)
        want[b] = acc / nrm
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_sphere_normals_point_outward():
    model, tri = synthetic_face(16, 32, 4, 2)
    v = model(jnp.zeros((1, 6)))
    n = mesh_point_normal(v, tri)
    # for a sphere centred at origin, normals ≈ v/|v|
    vv = np.asarray(v[0])
    vv = vv / np.linalg.norm(vv, axis=-1, keepdims=True)
    cos = (np.asarray(n[0]) * vv).sum(-1)
    assert (cos > 0.9).mean() > 0.95


def test_linear_morphable_model():
    m = make_linear_morphable_model(20, 4, 3, sigma_shape=2.0, sigma_expression=0.5)
    x = m.random_input(jax.random.PRNGKey(0), 64)
    assert x.shape == (64, 7)
    # samples follow sigma
    assert 1.0 < float(jnp.std(x[:, :4])) < 3.5
    assert 0.2 < float(jnp.std(x[:, 4:])) < 1.0
    v = m(x)
    assert v.shape == (64, 20, 3)
    r = m.regulation(x)
    assert np.isfinite(float(r)) and float(r) > 0
    # linearity: v(2x) - v(0) == 2*(v(x) - v(0))
    v0 = m(jnp.zeros((1, 7)))
    v1 = m(x[:1])
    v2 = m(2 * x[:1])
    np.testing.assert_allclose(
        np.asarray(v2 - v0), 2 * np.asarray(v1 - v0), rtol=1e-3, atol=1e-4
    )


def test_blendshape_model():
    m = make_blendshape_model(15, 3, 2)
    x = m.random_input(jax.random.PRNGKey(0), 8)
    assert x.shape == (8, 5)
    v = m(x)
    assert v.shape == (8, 15, 3)
    assert np.isfinite(np.asarray(v)).all()
    assert np.isfinite(float(m.regulation(x)))


def test_lbs_model_identity_pose():
    m = make_lbs_model(30, 4, 5, parents=(0, 1, 1))
    x = jnp.zeros((2, 5 + 9))
    v = m(x)
    assert v.shape == (2, 30, 3)
    # zero pose, zero shape -> template (rotations identity)
    want = np.asarray(m.v_template).reshape(1, 30, 3)
    np.testing.assert_allclose(np.asarray(v), np.tile(want, (2, 1, 1)), rtol=1e-4, atol=1e-4)
    xr = m.random_input(jax.random.PRNGKey(1), 2)
    v2 = m(xr)
    assert np.isfinite(np.asarray(v2)).all()
    assert np.isfinite(float(m.regulation(xr)))


def test_lbs_rigid_rotation_preserves_bone_length():
    """Rotating one joint must preserve distances of vertices fully bound to it."""
    m = make_lbs_model(12, 2, 2, parents=(0,))
    # bind all vertices to joint 1; zero pose-corrective blendshapes (they
    # deform non-rigidly by design)
    m = m.replace(
        lbs_weights=jnp.tile(jnp.asarray([[0.0, 1.0]]), (12, 1)),
        posedirs=jnp.zeros_like(m.posedirs),
    )
    x0 = jnp.zeros((1, 2 + 3))
    x1 = x0.at[0, 2:].set(jnp.asarray([0.3, -0.2, 0.5]))
    v0, v1 = m(x0), m(x1)
    d0 = np.linalg.norm(np.asarray(v0[0, :1] - v0[0, 1:]), axis=-1)
    d1 = np.linalg.norm(np.asarray(v1[0, :1] - v1[0, 1:]), axis=-1)
    np.testing.assert_allclose(d0, d1, rtol=1e-4)


def test_random_apply_pose3D():
    rng = np.random.RandomState(3)
    v = jnp.asarray(rng.randn(4, 25, 3).astype(np.float32))
    out = random_apply_pose3D(jax.random.PRNGKey(0), v)
    assert out.shape == v.shape
    # zero-variance config is identity
    out_id = random_apply_pose3D(jax.random.PRNGKey(1), v, p=[0] * 7)
    np.testing.assert_allclose(np.asarray(out_id), np.asarray(v), rtol=1e-5, atol=1e-6)
    # pure rotation+scale preserves pairwise distance ratios per batch elem
    out_r = random_apply_pose3D(jax.random.PRNGKey(2), v, p=[0.5, 0.2, 0.2, 0, 0, 0, 0])
    d_in = np.linalg.norm(np.asarray(v[0, :1] - v[0, 1:]), axis=-1)
    d_out = np.linalg.norm(np.asarray(out_r[0, :1] - out_r[0, 1:]), axis=-1)
    np.testing.assert_allclose(d_out / d_in, (d_out / d_in)[0], rtol=1e-3)


def _matlab_cell(x):
    cell = np.empty((1, 1), dtype=object)
    cell[0, 0] = x
    return cell


def test_load_bfm_from_dict():
    rng = np.random.RandomState(4)
    nv = 18
    data = {
        "v": rng.randn(3, nv) * 1e4,
        "w_shape": rng.randn(3 * nv, 5) * 1e3,
        "w_exp": rng.randn(3 * nv, 4) * 1e3,
        "tri": _matlab_cell(rng.randint(1, nv + 1, (3, 10))),
    }
    model, tri = load_bfm(data)
    assert model.dim == [5, 4, 3 * nv]
    assert tri.shape == (10, 3)
    assert int(jnp.min(tri)) == 0
    v = model(model.random_input(jax.random.PRNGKey(0), 2))
    assert v.shape == (2, nv, 3)
    # mean-centred + 1e-5 scaled
    v0 = model(jnp.zeros((1, 9)))
    assert float(jnp.abs(jnp.mean(v0))) < 1.0


def test_load_facewarehouse_from_dict():
    rng = np.random.RandomState(5)
    nv, S, E = 14, 4, 3
    data = {
        "v": rng.randn(3, nv),
        # FaceWarehouse tensor layout: (3*nv, expr+1, id+1)
        "p": rng.randn(3 * nv, E + 1, S + 1),
        "tri": rng.randint(0, nv, (3, 8)),
    }
    model, tri = load_facewarehouse(data)
    assert model.dim == [S, E, 3 * nv]
    assert tri.shape == (8, 3)
    x = model.random_input(jax.random.PRNGKey(0), 2)
    v = model(x)
    assert v.shape[0] == 2 and v.shape[2] == 3


def test_load_flame_from_dict():
    rng = np.random.RandomState(6)
    nv, nj, S = 16, 4, 6
    data = {
        "v_template": rng.randn(nv, 3),
        "posedirs": rng.randn(nv, 3, (nj - 1) * 9),
        "shapedirs": rng.randn(nv, 3, S),
        "J_regressor": np.abs(rng.rand(nj, nv)),
        "kintree_table": np.vstack([[-1, 0, 1, 1], np.arange(4)]),
        "weights": np.abs(rng.rand(nv, nj)),
        "f": rng.randint(0, nv, (9, 3)),
    }
    model, tri = load_flame(data)
    assert tri.shape == (9, 3)
    x = model.random_input(jax.random.PRNGKey(0), 2)
    v = model(x)
    assert v.shape == (2, nv, 3)
    assert np.isfinite(np.asarray(v)).all()
