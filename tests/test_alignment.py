"""Alignment toolchain tests: Procrustes solvers recover known transforms,
grabcut segments a synthetic face blob, align_face straightens a rotated
image, euler roundtrip."""

import numpy as np
import pytest

from stylerenderer_tpu.face3d.alignment import (
    SkinSegmentationGrabcut,
    align_face,
    align_face_ortho,
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


def test_solve_ortho_lm_refine():
    """max_iter > 0 runs the reference's leastsq refinement
    (utils_face.py:371-392) and must not degrade an exact solution — and
    must improve a noisy closed-form estimate."""
    rng = np.random.RandomState(2)
    p3 = rng.randn(30, 3)
    import scipy.spatial.transform as st

    R_true = st.Rotation.from_rotvec([0.3, 0.2, -0.5]).as_matrix()
    s_true, t_true = 1.8, np.array([2.0, 4.0])
    p2 = s_true * (p3 @ R_true)[:, :2] + t_true
    # exact data: refined == closed form == truth
    s, R, t = solve_ortho(p3, p2, max_iter=200)
    np.testing.assert_allclose(s, s_true, rtol=1e-6)
    np.testing.assert_allclose(R[:, :2], R_true[:, :2], atol=1e-6)

    # noisy data: LM reprojection error <= closed-form error
    p2n = p2 + rng.randn(*p2.shape) * 0.05

    def reproj(sol):
        s_, R_, t_ = sol
        return np.linalg.norm(s_ * (p3 @ R_)[:, :2] + t_ - p2n)

    err_cf = reproj(solve_ortho(p3, p2n))
    err_lm = reproj(solve_ortho(p3, p2n, max_iter=500))
    assert err_lm <= err_cf + 1e-9


def test_render_and_detect_canonical_reference():
    """The reference's canonical path (utils_face.py:486-519): rasterize the
    textured mean face, run a detector on the render, use its landmarks."""
    from stylerenderer_tpu.face3d import synthetic_face
    from stylerenderer_tpu.face3d.alignment import (
        build_canonical_reference_render, render_mean_face,
    )

    face, tri = synthetic_face(16, 32, 4, 2)
    nv = face.mean.shape[0] // 3
    tex = np.tile(
        np.linspace(0.2, 0.9, nv, dtype=np.float32)[:, None], (1, 3)
    )
    img = render_mean_face(face, tex, tri, 96, 96)
    assert img.shape == (96, 96, 3) and img.dtype == np.uint8
    assert img.max() > 50  # the face actually rendered

    class BrightestPixels:
        """Toy detector: returns the k brightest pixel coords."""

        def detect(self, im):
            gray = im.mean(-1)
            idx = np.argsort(gray.ravel())[-5:]
            y, x = np.unravel_index(idx, gray.shape)
            return np.stack([x, y], -1).astype(np.float32)

    ref = build_canonical_reference_render(face, tex, tri, BrightestPixels(), 96)
    assert ref.shape == (5, 2)
    assert np.isfinite(ref).all()
    assert (ref >= 0).all() and (ref < 96).all()


def test_align_face_ortho_straightens():
    cv2 = pytest.importorskip("cv2")
    size = 64
    # canonical 3D landmarks on the z=0 plane in pixel units
    base3d = np.asarray(
        [[20, 20, 0], [44, 20, 0], [32, 44, 0], [26, 32, 0]], np.float64
    )
    theta = np.deg2rad(20)
    c, s = 0.9 * np.cos(theta), 0.9 * np.sin(theta)
    T = np.asarray([[c, -s, 4.0], [s, c, -2.0]])
    lmk = base3d[:, :2] @ T[:, :2].T + T[:, 2]
    img = np.zeros((size, size, 3), np.uint8)
    for p in lmk.astype(int):
        cv2.circle(img, tuple(p), 2, (255, 255, 255), -1)
    out = align_face_ortho(img, lmk, base3d, size, max_iter=300)
    for p in base3d[:, :2].astype(int):
        patch = out[p[1] - 4 : p[1] + 5, p[0] - 4 : p[0] + 5]
        assert patch.max() > 100, p


def test_landmarks_manifest_reader(tmp_path):
    from stylerenderer_tpu.face3d.alignment import LandmarksManifestReader

    manifest = tmp_path / "lmk.txt"
    manifest.write_text(
        "b.png 5 6 7 8\n"
        "a.jpg 1 2 3 4\n"
        "\n"
        "not_a_landmark_line\n"
    )
    r = LandmarksManifestReader(str(manifest))
    np.testing.assert_array_equal(
        r.detect("/photos/a.jpg"), [[1, 2], [3, 4]]
    )
    np.testing.assert_array_equal(r.detect("b.png"), [[5, 6], [7, 8]])
    assert r.detect("missing.png") is None


def test_skin_segmentation_torch_adapter():
    """Interface-level test with a tiny stand-in torch module (the real
    FCNResNet101/BiSeNetV2 weights don't ship offline)."""
    torch = pytest.importorskip("torch")

    class TinySeg(torch.nn.Module):
        def forward(self, x):
            # bright pixels -> high logit (x is ImageNet-normalized)
            return {"out": x.mean(1, keepdim=True) * 4.0}

    from stylerenderer_tpu.face3d.alignment import SkinSegmentationTorch

    seg = SkinSegmentationTorch(TinySeg())
    img = np.zeros((70, 66, 3), np.uint8)  # non-multiple-of-32 -> crop+pad
    img[10:40, 10:40] = 250
    mask = seg.segment(img)
    assert mask.shape == (70, 66)
    assert mask.dtype == bool
    assert mask[20, 20] and not mask[60, 5]
    assert not mask[69, 65]  # padded region is background


def test_recognition_feature_wrapper():
    from stylerenderer_tpu.face3d.alignment import RecognitionFeature

    rec = RecognitionFeature()
    img = (np.random.RandomState(0).rand(120, 100, 3) * 255).astype(np.uint8)
    emb = rec.detect(img)
    assert emb.shape == (512,)
    np.testing.assert_allclose(np.linalg.norm(emb), 1.0, rtol=1e-4)
    # deterministic
    np.testing.assert_array_equal(emb, rec.detect(img))
