"""Alignment toolchain tests: Procrustes solvers recover known transforms,
grabcut segments a synthetic face blob, align_face straightens a rotated
image, euler roundtrip."""

import numpy as np
import pytest

from stylerenderer_tpu.face3d.alignment import (
    SkinSegmentationGrabcut,
    align_face,
    build_canonical_reference,
    euler_mat_inv,
    solve_affine,
    solve_ortho,
)
from stylerenderer_tpu.face3d.transforms import euler_mat


def test_solve_affine_recovers_similarity():
    rng = np.random.RandomState(0)
    src = rng.rand(10, 2) * 100
    theta, scale, t = 0.3, 1.7, np.array([5.0, -3.0])
    R = np.array([[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]])
    dst = scale * src @ R.T + t
    M = solve_affine(src, dst)
    got = src @ M[:, :2].T + M[:, 2]
    np.testing.assert_allclose(got, dst, atol=1e-8)
    np.testing.assert_allclose(np.linalg.det(M[:, :2]), scale**2, rtol=1e-6)


def test_solve_ortho_recovers_pose():
    rng = np.random.RandomState(1)
    p3 = rng.randn(20, 3)
    import scipy.spatial.transform as st

    R_true = st.Rotation.from_rotvec([0.2, -0.4, 0.1]).as_matrix()
    s_true, t_true = 2.5, np.array([3.0, -1.0])
    p2 = s_true * (p3 @ R_true)[:, :2] + t_true
    s, R, t = solve_ortho(p3, p2)
    np.testing.assert_allclose(s, s_true, rtol=1e-6)
    np.testing.assert_allclose(R[:, :2], R_true[:, :2], atol=1e-6)
    np.testing.assert_allclose(t, t_true, atol=1e-6)


def test_euler_roundtrip():
    import jax.numpy as jnp

    ang = np.array([0.3, -0.2, 0.5])
    R = np.asarray(euler_mat(jnp.asarray(ang), "yxz"))
    back = euler_mat_inv(R, "yxz")
    np.testing.assert_allclose(back, ang, atol=1e-6)


def test_grabcut_segments_blob():
    cv2 = pytest.importorskip("cv2")
    img = np.full((64, 64, 3), 30, np.uint8)
    cv2.circle(img, (32, 32), 18, (200, 160, 140), -1)
    theta = np.linspace(0, 2 * np.pi, 16, endpoint=False)
    lmk = np.stack([32 + 15 * np.cos(theta), 32 + 15 * np.sin(theta)], -1)
    seg = SkinSegmentationGrabcut(erode=4, dilate=8).segment(img, lmk)
    assert seg[32, 32] == 1
    assert seg[2, 2] == 0
    assert 0.05 < seg.mean() < 0.6


def test_align_face_straightens():
    cv2 = pytest.importorskip("cv2")
    size = 64
    ref = np.asarray([[20, 20], [44, 20], [32, 44]], np.float32)
    # a rotated/translated version of the reference triangle
    M_fwd = cv2.getRotationMatrix2D((32, 32), 25, 0.8)
    lmk = ref @ M_fwd[:, :2].T + M_fwd[:, 2]
    img = np.zeros((size, size, 3), np.uint8)
    for p in lmk.astype(int):
        cv2.circle(img, tuple(p), 2, (255, 255, 255), -1)
    out = align_face(img, lmk, ref, size)
    # the warped dots should land near the reference positions
    for p in ref.astype(int):
        patch = out[p[1] - 3 : p[1] + 4, p[0] - 3 : p[0] + 4]
        assert patch.max() > 100


def test_canonical_reference_shape():
    from stylerenderer_tpu.face3d import synthetic_face

    face, tri = synthetic_face(8, 16, 4, 2)
    ref = build_canonical_reference(face, tri, [0, 10, 50], size=128)
    assert ref.shape == (3, 2)
    assert np.isfinite(ref).all()
