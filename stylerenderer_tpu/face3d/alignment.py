"""Face alignment & preprocessing toolchain (reference ``utils_face.py``).

Host-side (numpy/cv2) — this is offline dataset preparation, not TPU work:

- pluggable landmark detectors behind a uniform ``detect(img) -> [68, 2]``
  interface: precomputed-file reader, dlib (gated on availability), and a
  generic torch-module adapter for PFLD-style nets (utils_face.py:51-229);
- pose solvers: ``solve_ortho`` (scaled-orthographic Procrustes, 3D
  landmarks -> 2D, via SVD), ``solve_affine`` (2D similarity Procrustes),
  ``euler_mat_inv`` (rotation -> euler angles) (utils_face.py:351-447);
- ``SkinSegmentationGrabcut``: landmark-hull trimap + cv2.grabCut
  (utils_face.py:230-287);
- ``align_face`` / ``build_canonical_reference``: rasterize the mean 3DMM
  face, detect landmarks on the render, solve the similarity transform per
  photo, warp to the aligned crop (utils_face.py:486-545).
"""

from __future__ import annotations

import os
from typing import Callable, Sequence

import numpy as np


# --------------------------------------------------------------------------
# landmark detectors
# --------------------------------------------------------------------------


class LandmarksReader:
    """Reads precomputed landmarks from sidecar .txt files: one 'x y' pair
    per line (utils_face.py:51-72)."""

    def __init__(self, lmk_dir: str, suffix: str = ".txt"):
        self.lmk_dir = lmk_dir
        self.suffix = suffix

    def detect_path(self, image_path: str) -> np.ndarray:
        base = os.path.splitext(os.path.basename(image_path))[0]
        path = os.path.join(self.lmk_dir, base + self.suffix)
        pts = []
        with open(path) as f:
            for line in f:
                parts = line.split()
                if len(parts) >= 2:
                    pts.append([float(parts[0]), float(parts[1])])
        return np.asarray(pts, np.float32)


class LandmarksDetectorDlib:
    """dlib 68-point detector (utils_face.py:93-130); gated on dlib."""

    def __init__(self, predictor_path: str):
        import dlib  # raises ImportError when unavailable

        self.detector = dlib.get_frontal_face_detector()
        self.predictor = dlib.shape_predictor(predictor_path)

    def detect(self, img: np.ndarray) -> np.ndarray | None:
        import dlib

        rects = self.detector(img, 1)
        if not rects:
            return None
        shape = self.predictor(img, rects[0])
        return np.asarray(
            [[shape.part(i).x, shape.part(i).y] for i in range(shape.num_parts)],
            np.float32,
        )


class LandmarksDetectorTorch:
    """Adapter for PFLD-style torch landmark nets (utils_face.py:131-229):
    net(img[1,3,S,S] in [0,1]) -> [1, 2L] normalized coords."""

    def __init__(self, net, input_size: int = 112):
        self.net = net
        self.input_size = input_size

    def detect(self, img: np.ndarray) -> np.ndarray:
        import torch

        h, w = img.shape[:2]
        import cv2

        x = cv2.resize(img, (self.input_size, self.input_size))
        x = torch.from_numpy(x.astype(np.float32) / 255.0).permute(2, 0, 1)[None]
        with torch.no_grad():
            out = self.net(x)
        if isinstance(out, (tuple, list)):
            out = out[-1]
        lmk = out.reshape(-1, 2).cpu().numpy()
        return lmk * np.asarray([w, h], np.float32)


# --------------------------------------------------------------------------
# pose solvers
# --------------------------------------------------------------------------


def solve_ortho(pts3d: np.ndarray, pts2d: np.ndarray):
    """Scaled-orthographic pose from 3D<->2D correspondences
    (utils_face.py:351-392 intent): find s, R, t minimizing
    ``|| s * (P3 @ R)[:, :2] + t - P2 ||``.

    Returns (scale, R [3,3], t [2]).
    """
    p3 = np.asarray(pts3d, np.float64)
    p2 = np.asarray(pts2d, np.float64)
    c3 = p3.mean(0)
    c2 = p2.mean(0)
    q3 = p3 - c3
    q2 = p2 - c2
    # M maps 3D -> 2D: q2 ≈ q3 @ M with M [3,2]; lift to a rotation via SVD
    M, *_ = np.linalg.lstsq(q3, q2, rcond=None)
    # complete M's columns to an orthonormal frame
    u, s, vt = np.linalg.svd(M, full_matrices=False)  # u [3,2]
    scale = s.mean()
    r12 = u @ vt  # [3,2] with orthonormal columns
    r3 = np.cross(r12[:, 0], r12[:, 1])
    R = np.stack([r12[:, 0], r12[:, 1], r3], axis=1)  # [3,3], det +1
    if np.linalg.det(R) < 0:
        R[:, 2] *= -1
    t = c2 - scale * (c3 @ R)[:2]
    return float(scale), R, t


def solve_affine(src2d: np.ndarray, dst2d: np.ndarray):
    """2D similarity (rotation+scale+translation) Procrustes
    (utils_face.py:393-418). Returns [2, 3] affine matrix for cv2.warpAffine."""
    src = np.asarray(src2d, np.float64)
    dst = np.asarray(dst2d, np.float64)
    cs, cd = src.mean(0), dst.mean(0)
    qs, qd = src - cs, dst - cd
    a = (qs * qd).sum() / (qs * qs).sum()
    b = (qs[:, 0] * qd[:, 1] - qs[:, 1] * qd[:, 0]).sum() / (qs * qs).sum()
    M = np.asarray([[a, -b], [b, a]])
    t = cd - cs @ M.T
    return np.concatenate([M, t[:, None]], axis=1)


def euler_mat_inv(R: np.ndarray, order: str = "yxz") -> np.ndarray:
    """Rotation matrix -> euler angles for the given order, inverse of
    transforms.euler_mat (utils_face.py:419-447)."""
    from scipy.spatial.transform import Rotation

    return Rotation.from_matrix(np.asarray(R)).as_euler(order)


# --------------------------------------------------------------------------
# skin segmentation
# --------------------------------------------------------------------------


class SkinSegmentationGrabcut:
    """Landmark-hull trimap + cv2.grabCut (utils_face.py:230-287)."""

    def __init__(self, iters: int = 3, erode: int = 10, dilate: int = 20):
        self.iters = iters
        self.erode = erode
        self.dilate = dilate

    def segment(self, img: np.ndarray, lmk: np.ndarray) -> np.ndarray:
        import cv2

        h, w = img.shape[:2]
        hull = cv2.convexHull(np.asarray(lmk, np.int32))
        fill = np.zeros((h, w), np.uint8)
        cv2.fillConvexPoly(fill, hull, 1)
        kernel_e = np.ones((self.erode, self.erode), np.uint8)
        kernel_d = np.ones((self.dilate, self.dilate), np.uint8)
        sure_fg = cv2.erode(fill, kernel_e)
        maybe = cv2.dilate(fill, kernel_d)
        mask = np.full((h, w), cv2.GC_BGD, np.uint8)
        mask[maybe > 0] = cv2.GC_PR_FGD
        mask[sure_fg > 0] = cv2.GC_FGD
        bgd = np.zeros((1, 65), np.float64)
        fgd = np.zeros((1, 65), np.float64)
        cv2.grabCut(img, mask, None, bgd, fgd, self.iters,
                    cv2.GC_INIT_WITH_MASK)
        return ((mask == cv2.GC_FGD) | (mask == cv2.GC_PR_FGD)).astype(np.uint8)


# --------------------------------------------------------------------------
# alignment pipeline
# --------------------------------------------------------------------------


def build_canonical_reference(face_model, tri, lmk_vidx, size: int = 256):
    """Canonical 2D landmark positions: project the mean face's landmark
    vertices with the renderer's NDC->pixel mapping. The reference instead
    rasterizes the mean face and runs the detector on the render
    (utils_face.py:486-519) — equivalent when the landmark vertex ids are
    known, and detector-free."""
    import jax.numpy as jnp

    v = np.asarray(face_model(jnp.zeros((1, face_model.sigma.shape[0]))))[0]
    lv = v[np.asarray(lmk_vidx)]
    px = (1 + lv[:, 0]) * size / 2 - 0.5
    py = (1 - lv[:, 1]) * size / 2 - 0.5
    return np.stack([px, py], -1).astype(np.float32)


def align_face(img: np.ndarray, lmk: np.ndarray, ref_lmk: np.ndarray,
               size: int = 256) -> np.ndarray:
    """Similarity-warp ``img`` so its landmarks match the canonical
    reference (utils_face.py:527-545)."""
    import cv2

    M = solve_affine(lmk, ref_lmk)
    return cv2.warpAffine(img, M, (size, size), flags=cv2.INTER_LINEAR)


def align_dataset(in_dir: str, out_dir: str, detector, face_model, tri,
                  lmk_vidx, size: int = 256) -> int:
    """Batch alignment CLI core: detect -> solve -> warp -> save."""
    import cv2

    from stylerenderer_tpu.data.prepare import list_images

    os.makedirs(out_dir, exist_ok=True)
    ref = build_canonical_reference(face_model, tri, lmk_vidx, size)
    n = 0
    for path in list_images(in_dir):
        img = cv2.imread(path)
        if img is None:
            continue
        lmk = (
            detector.detect_path(path)
            if hasattr(detector, "detect_path")
            else detector.detect(img)
        )
        if lmk is None:
            continue
        out = align_face(img, lmk, ref, size)
        cv2.imwrite(os.path.join(out_dir, os.path.basename(path)), out)
        n += 1
    return n
