"""Shared benchmark helpers. IMPORTANT on this backend: block_until_ready
does not sync through the axon tunnel — always force a host readback."""

import time

import numpy as np
import jax


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[:1]


def timed(fn, *args, iters: int = 5):
    """Compile + time fn(*args) with readback sync; returns seconds/call."""
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters


def production_face(batch: int = 8, seed: int = 0):
    """BFM-scale synthetic face (~50k verts / ~100k tris) + posed samples."""
    import jax.numpy as jnp

    from stylerenderer_tpu.face3d import mesh_point_normal, synthetic_face

    face, tri = synthetic_face(180, 280, 80, 29)
    x = face.random_input(jax.random.PRNGKey(seed), batch)
    vert = face(x)
    norm = mesh_point_normal(vert, tri)
    return face, tri, vert, norm
