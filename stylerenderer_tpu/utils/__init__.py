from stylerenderer_tpu.utils.config import TrainConfig

__all__ = ["TrainConfig"]
