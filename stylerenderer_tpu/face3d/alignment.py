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


class LandmarksManifestReader:
    """Reads a single manifest txt — each non-empty line is
    ``imagename.png x0 y0 x1 y1 ...`` — and answers ``detect(img_name)`` by
    suffix-matching the name (utils_face.py:51-72)."""

    def __init__(self, file_name: str):
        names, data = [], []
        with open(file_name) as f:
            for line in f:
                toks = line.split()
                if not toks:
                    continue
                name = [t for t in toks
                        if len(t) > 4 and t[-4:].lower() in (".png", ".jpg", ".bmp")]
                nums = []
                for t in toks:
                    try:
                        nums.append(float(t))
                    except ValueError:
                        pass
                if name and nums:
                    names.append(name[0])
                    data.append(nums)
        order = np.argsort(names)
        self.names = [names[i] for i in order]
        self.data = np.asarray(data, np.float32)[order] if data else np.zeros((0, 0))

    def detect(self, img_name: str) -> np.ndarray | None:
        for i, name in enumerate(self.names):
            if img_name.endswith(name):
                return self.data[i].reshape(-1, 2)
        return None


class LandmarksDetectorExec:
    """External-binary detector (utils_face.py:73-92): invokes
    ``exec <out.txt> <image-or-dir>`` in the binary's directory, then parses
    the manifest it wrote. Accepts an image array, an image path, or a list
    of paths (uses subprocess, not the reference's shell interpolation)."""

    def __init__(self, exec_path: str, workdir: str | None = None):
        self.exec_path = os.path.abspath(exec_path)
        self.workdir = workdir or os.path.join(
            os.path.dirname(self.exec_path), ".lmk_tmp"
        )

    def detect(self, img):
        import subprocess
        import tempfile

        import cv2

        os.makedirs(self.workdir, exist_ok=True)
        tmp_img = None
        if isinstance(img, str):
            names, argv = [os.path.basename(img)], os.path.abspath(img)
        elif hasattr(img, "__len__") and len(img) > 0 and isinstance(img[0], str):
            names = [os.path.basename(p) for p in img]
            argv = os.path.abspath(os.path.dirname(img[0]))
        else:
            fd, tmp_img = tempfile.mkstemp(suffix=".png", dir=self.workdir)
            os.close(fd)
            cv2.imwrite(tmp_img, img)
            names, argv = [os.path.basename(tmp_img)], tmp_img
        out_txt = os.path.join(self.workdir, "lmk.txt")
        try:
            subprocess.run(
                [self.exec_path, out_txt, argv],
                cwd=os.path.dirname(self.exec_path),
                check=True,
                capture_output=True,
            )
            reader = LandmarksManifestReader(out_txt)
            lmks = [reader.detect(n) for n in names]
        finally:
            if tmp_img and os.path.exists(tmp_img):
                os.remove(tmp_img)
            if os.path.exists(out_txt):
                os.remove(out_txt)
        return lmks[0] if len(lmks) == 1 else np.asarray(lmks)


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


def _rodrigues_np(rvec: np.ndarray) -> np.ndarray:
    """Axis-angle -> rotation matrix, host numpy (cv2.Rodrigues fwd)."""
    r = np.asarray(rvec, np.float64).reshape(3)
    th = np.linalg.norm(r)
    if th < 1e-12:
        return np.eye(3)
    k = r / th
    K = np.asarray([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * (K @ K)


def _rodrigues_inv_np(R: np.ndarray) -> np.ndarray:
    """Rotation matrix -> axis-angle (cv2.Rodrigues inverse)."""
    from scipy.spatial.transform import Rotation

    return Rotation.from_matrix(np.asarray(R, np.float64)).as_rotvec()


def solve_ortho(pts3d: np.ndarray, pts2d: np.ndarray, max_iter: int = 0,
                eps: float = 1e-9):
    """Scaled-orthographic pose from 3D<->2D correspondences
    (utils_face.py:351-392 intent): find s, R, t minimizing
    ``|| s * (P3 @ R)[:, :2] + t - P2 ||``.

    ``max_iter > 0`` refines the closed-form SVD solution with a
    Levenberg-Marquardt pass over (axis-angle, scale, translation) — the
    reference's ``scipy.optimize.leastsq`` + cv2.Rodrigues refinement
    (utils_face.py:371-392).

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

    if max_iter > 0:
        from scipy.optimize import leastsq

        def fun(x):
            Rx = _rodrigues_np(x[:3])
            proj = x[3] * (p3 @ Rx)[:, :2] + x[4:6]
            return (proj - p2).reshape(-1)

        x0 = np.concatenate([_rodrigues_inv_np(R), [scale], t])
        x, _ = leastsq(fun, x0, ftol=eps, maxfev=int(max_iter))
        scale, R, t = float(x[3]), _rodrigues_np(x[:3]), x[4:6]
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


class SkinSegmentationTorch:
    """Neural skin segmentation behind a torch module
    (utils_face.py:288-333 ``SkinSegmentationPytorch`` semantics):
    ImageNet-normalize, crop H/W to multiples of 32, sigmoid the first
    output channel, threshold, zero-pad back to the input size.

    ``model``: any torch module whose forward returns a tensor or a dict
    with ``'out'`` (e.g. ``torchvision.models.segmentation.fcn_resnet101``
    or a BiSeNetV2 port). Defaults to torchvision's FCN-ResNet101 with
    ``num_classes=1`` (weights must be supplied — none ship offline)."""

    def __init__(self, model=None, threshold: float = 0.5):
        import torch

        if model is None:
            from torchvision.models.segmentation import fcn_resnet101

            model = fcn_resnet101(weights=None, num_classes=1)
        self.model = model.eval()
        self.mean = np.asarray([0.485, 0.456, 0.406], np.float32)
        self.std = np.asarray([0.229, 0.224, 0.225], np.float32)
        self.th = min(max(threshold, 0.0), 1.0)

    def segment(self, img: np.ndarray, *args) -> np.ndarray:
        import torch

        h, w = img.shape[:2]
        x = img.astype(np.float32)
        if x.max() > 2.0:
            x = x / 255.0
        x = x[: (h // 32) * 32, : (w // 32) * 32]
        if x.ndim == 2 or x.shape[-1] == 1:
            x = np.tile(x.reshape(x.shape[0], x.shape[1], 1), [1, 1, 3])
        else:
            x = x[:, :, ::-1]  # BGR (cv2) -> RGB
        x = (x - self.mean) / self.std
        x = torch.from_numpy(np.transpose(x, (2, 0, 1)).copy())[None]
        with torch.no_grad():
            out = self.model(x)
            if isinstance(out, dict):
                out = out["out"]
            mask = torch.sigmoid(out)[0, 0].numpy()
        if h > mask.shape[0] or w > mask.shape[1]:
            mask = np.pad(
                mask, ((0, h - mask.shape[0]), (0, w - mask.shape[1])),
                "constant",
            )
        return mask > self.th


class RecognitionFeature:
    """Face-embedding wrapper (utils_face.py:334-350): detect/crop then embed
    with the InceptionResnetV1 port (supervisors/recognition.py). The
    reference uses MTCNN for the crop; any ``detect_crop(img)->[160,160,3]``
    callable plugs in (default: center square crop — MTCNN weights don't
    ship offline)."""

    def __init__(self, params=None, detect_crop=None, rng_seed: int = 0):
        import jax

        from stylerenderer_tpu.supervisors.recognition import InceptionResnetV1

        self.net = InceptionResnetV1()
        if params is None:
            import jax.numpy as jnp

            params = self.net.init(
                jax.random.PRNGKey(rng_seed), jnp.zeros((1, 160, 160, 3))
            )
        self.params = params
        self.detect_crop = detect_crop

    def detect(self, img: np.ndarray) -> np.ndarray | None:
        import cv2
        import jax.numpy as jnp

        if self.detect_crop is not None:
            crop = self.detect_crop(img)
            if crop is None:
                return None
        else:
            h, w = img.shape[:2]
            s = min(h, w)
            y0, x0 = (h - s) // 2, (w - s) // 2
            crop = cv2.resize(img[y0:y0 + s, x0:x0 + s], (160, 160))
        x = crop.astype(np.float32)
        if x.max() > 2.0:
            x = x / 127.5 - 1.0  # reference post_process color range [-1, 1]
        emb = self.net.apply(self.params, jnp.asarray(x)[None])
        return np.asarray(emb)[0]


# --------------------------------------------------------------------------
# alignment pipeline
# --------------------------------------------------------------------------


def render_mean_face(face_model, tex, tri, height: int, width: int) -> np.ndarray:
    """Rasterize the mean 3DMM face with its per-vertex texture at the target
    image size (utils_face.py:516-518) — the input to the detector-based
    canonical reference. Returns a uint8 BGR image (cv2 convention)."""
    import jax.numpy as jnp

    from stylerenderer_tpu.ops.rasterize import rasterize

    v = face_model(jnp.zeros((1, face_model.sigma.shape[0])))
    t = jnp.asarray(tex, jnp.float32)[None]
    img = np.asarray(rasterize(v, t, jnp.asarray(tri), height, width))[0]
    if img.max() <= 2.0:  # texture in [0,1] -> bytes
        img = img * 255.0
    return np.clip(img[:, :, ::-1], 0, 255).astype(np.uint8)  # RGB->BGR


def build_canonical_reference_render(face_model, tex, tri, detector,
                                     size: int = 256) -> np.ndarray:
    """The reference's canonical path (utils_face.py:486-519): rasterize the
    textured mean face and run the landmark detector ON THE RENDER — no
    landmark vertex table needed (BFM ships none). Returns [L, 2] pixel
    landmarks of the canonical face."""
    render = render_mean_face(face_model, tex, tri, size, size)
    lmk = detector.detect(render)
    if lmk is None or len(lmk) == 0:
        raise RuntimeError("detector found no face on the mean-face render")
    return np.asarray(lmk, np.float32)


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


def align_face_ortho(img: np.ndarray, lmk: np.ndarray, base_lmk3d: np.ndarray,
                     size: int = 256, max_iter: int = 0) -> np.ndarray:
    """The reference's 3D-landmark path (utils_face.py:529-545): solve the
    scaled-orthographic pose from canonical 3D landmarks to the detected 2D
    landmarks, keep only the in-plane (roll) rotation + scale + translation
    as a 2D similarity, and inverse-warp the photo to the canonical frame
    (BORDER_REFLECT, like the reference)."""
    import cv2

    scale, R, t = solve_ortho(np.asarray(base_lmk3d), np.asarray(lmk),
                              max_iter=max_iter)
    rot = euler_mat_inv(R, "yxz")  # (yaw, pitch, roll) for order 'yxz'
    # solve_ortho's R acts on row vectors (p2 = s·(p3 @ R)[:, :2] + t); the
    # cv2 warp matrix acts on column vectors -> use the transposed block
    c, s = scale * np.cos(rot[2]), scale * np.sin(rot[2])
    T = np.asarray([[c, s, t[0]], [-s, c, t[1]], [0.0, 0.0, 1.0]])
    Tinv = np.linalg.inv(T)[:2, :]
    return cv2.warpAffine(img, Tinv, (size, size), flags=cv2.INTER_LINEAR,
                          borderMode=cv2.BORDER_REFLECT)


def align_dataset(in_dir: str, out_dir: str, detector, face_model, tri,
                  lmk_vidx=None, size: int = 256, tex=None) -> int:
    """Batch alignment CLI core: detect -> solve -> warp -> save.

    Canonical reference: if ``tex`` (per-vertex mean-face texture) is given,
    rasterize the mean face and detect landmarks on the render (the
    reference's own path, utils_face.py:486-519 — works with plain BFM,
    which ships no landmark vertex table); else use ``lmk_vidx``."""
    import cv2

    from stylerenderer_tpu.data.prepare import list_images

    os.makedirs(out_dir, exist_ok=True)
    if tex is not None:
        ref = build_canonical_reference_render(face_model, tex, tri, detector, size)
    elif lmk_vidx is not None:
        ref = build_canonical_reference(face_model, tri, lmk_vidx, size)
    else:
        raise ValueError("need tex (render-and-detect) or lmk_vidx")
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
