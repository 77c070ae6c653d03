"""Frozen perceptual supervisor networks (reference thirdparty submodules,
SURVEY.md §2 L9): pluggable pretrained critics that add consistency losses
during GAR training (train.py:316-330):

- ``sfs``  — shape-from-shading normal estimator (face_normals ResNetUNet):
             smooth-L1 between its prediction on the fake image and the
             rasterized normal map, weight 0.01;
- ``lmk``  — PFLD landmark regressor: landmark consistency between
             geometry-paired samples, weight 1e-5;
- ``feat`` — InceptionResnetV1 face embedding (facenet): identity
             consistency between shape-paired samples, weight 0.001.

The reference imports these dynamically from git submodules (empty in the
checkout) and silently skips the losses when missing; here they are faithful
flax ports with torch-state-dict converters (``convert.py``, validated
against torch mirror modules in tests/test_supervisor_convert.py) —
``make_extra_heads`` accepts a published .pth/.pth.tar path (or the raw
state dict) per head and converts it at load; without weights the heads run
fixed-seed random as architecture-correct stand-ins.
"""

from stylerenderer_tpu.supervisors.convert import (
    convert_face_normals,
    convert_facenet,
    convert_pfld,
)
from stylerenderer_tpu.supervisors.face_normals import ResNetUNet
from stylerenderer_tpu.supervisors.landmark import PFLDInference
from stylerenderer_tpu.supervisors.recognition import InceptionResnetV1
from stylerenderer_tpu.supervisors.hub import make_extra_heads

__all__ = [
    "InceptionResnetV1",
    "PFLDInference",
    "ResNetUNet",
    "convert_face_normals",
    "convert_facenet",
    "convert_pfld",
    "make_extra_heads",
]
