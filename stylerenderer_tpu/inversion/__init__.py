from stylerenderer_tpu.inversion.project import ProjectorConfig, make_projector

__all__ = ["ProjectorConfig", "make_projector"]
