from stylerenderer_tpu.parallel.mesh import (
    batch_sharding,
    constrain_batch,
    make_mesh,
    replicate,
    replicated,
    shard_batch,
)

__all__ = [
    "batch_sharding",
    "constrain_batch",
    "make_mesh",
    "replicate",
    "replicated",
    "shard_batch",
]
