from stylerenderer_tpu.inversion.project import (
    ProjectorConfig, make_projector, make_projector_jit,
)

__all__ = ["ProjectorConfig", "make_projector", "make_projector_jit"]
