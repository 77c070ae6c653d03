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
flax ports with torch-state-dict converters — load published weights for the
trained behavior, or use them randomly-initialized as architecture-correct
stand-ins in tests.
"""

from stylerenderer_tpu.supervisors.face_normals import ResNetUNet
from stylerenderer_tpu.supervisors.landmark import PFLDInference
from stylerenderer_tpu.supervisors.recognition import InceptionResnetV1
from stylerenderer_tpu.supervisors.hub import make_extra_heads

__all__ = [
    "InceptionResnetV1",
    "PFLDInference",
    "ResNetUNet",
    "make_extra_heads",
]
