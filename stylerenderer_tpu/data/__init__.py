from stylerenderer_tpu.data.dataset import (
    ImageFolderDataset,
    SRPackDataset,
    device_prefetch,
    prefetch_batches,
    to_train_tensor,
)
from stylerenderer_tpu.data.prepare import list_images, prepare
from stylerenderer_tpu.data.srpack import SRPackReader, SRPackWriter

__all__ = [
    "ImageFolderDataset",
    "SRPackDataset",
    "SRPackReader",
    "SRPackWriter",
    "device_prefetch",
    "list_images",
    "prefetch_batches",
    "prepare",
    "to_train_tensor",
]
