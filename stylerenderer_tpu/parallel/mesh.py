"""Device-mesh and sharding helpers — the TPU-native replacement for the
reference's torch.distributed/NCCL backend (``distributed.py``).

Under SPMD there is no process group, no launcher, no explicit all-reduce:
we build a ``jax.sharding.Mesh`` over the available devices, shard the batch
along the ``'data'`` axis, replicate parameters, and jit the train step —
XLA GSPMD inserts all gradient/metric reductions over ICI.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis: str = "data") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Leading-dim (batch) sharding."""
    return NamedSharding(mesh, P(axis))

def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    """Place a host array with the batch dim sharded over the mesh."""
    sh = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def constrain_batch(x, axis: str = "data"):
    """In-jit sharding constraint for batch-major intermediates."""
    return jax.lax.with_sharding_constraint(
        x, P(axis) if isinstance(axis, str) else axis
    )


def make_mesh_2d(n_data: int, n_space: int, devices=None) -> Mesh:
    """2-D mesh for batch x spatial sharding — the scaling headroom axis for
    this conv model (SURVEY.md §5.7: the 'sequence parallelism' analog here
    is image resolution; XLA GSPMD inserts halo exchanges for convs over
    spatially-sharded feature maps)."""
    devices = devices if devices is not None else jax.devices()
    n = n_data * n_space
    return Mesh(
        np.asarray(devices[:n]).reshape(n_data, n_space), ("data", "space")
    )


def image_sharding(mesh: Mesh) -> NamedSharding:
    """Shard NHWC images over (batch, height)."""
    return NamedSharding(mesh, P("data", "space"))
