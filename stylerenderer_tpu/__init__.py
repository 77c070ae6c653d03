"""StyleRenderer-TPU: a TPU-native (JAX/XLA/Pallas) generative adversarial renderer.

A ground-up re-design of WestlyPark/StyleRenderer ("StyleGAR", CVPR 2021 —
*Inverting Generative Adversarial Renderer for Face Reconstruction*) for TPU:

- ``ops``      — TPU kernels: upfirdn2d, fused bias+LeakyReLU, and the
                 differentiable z-buffered mesh rasterizer (the heart of GAR).
- ``nn``       — StyleGAN2 layer library (equalized lr, modulated conv, blur).
- ``models``   — Generator, GeneratorWithMap (the GAR), Discriminator, Regressor.
- ``face3d``   — 3D morphable face models (BFM / FaceWarehouse / FLAME), mesh
                 normals, rigid/euler/rodrigues transforms, ADA augmentation.
- ``parallel`` — device-mesh / sharding helpers (SPMD data parallel over ICI).
- ``train``    — jitted adversarial train step with R1 + path-length
                 regularization, ADA controller, and EMA.
- ``data``     — host-side dataset pipeline (packed record shards, prep CLI).
- ``eval``     — FID (InceptionV3), LPIPS, PPL.
- ``inversion``— on-device face-reconstruction (render inverting) driver.

Layout convention: images are NHWC (TPU-native), vertices are ``[B, nv, 3]``
in NDC, triangles are ``[nf, 3]`` int32.
"""

__version__ = "0.1.0"
