"""Training-step throughput (D+G+EMA with lazy R1/path-reg amortized).

python benchmarks/bench_train_step.py [size] [batch]
"""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from benchmarks.common import sync


def main(size: int = 64, batch: int = 8, steps: int = 100):
    from stylerenderer_tpu.face3d import mesh_point_normal, synthetic_face
    from stylerenderer_tpu.train import (
        init_train_state, make_models, make_train_step,
    )
    from stylerenderer_tpu.utils.config import TrainConfig

    cfg = TrainConfig(size=size, batch=batch, compute_dtype="bfloat16",
                      pyramid_mode="downsample")
    face, tri = synthetic_face(64, 128, 80, 29)
    gen, disc = make_models(cfg)
    x = face.random_input(jax.random.PRNGKey(0), 2)
    v = face(x)
    n = mesh_point_normal(v, tri)
    state = init_train_state(cfg, jax.random.PRNGKey(1), (v, n, tri))
    step_fn = jax.jit(make_train_step(cfg, gen, disc, face, tri))
    real = jax.random.normal(jax.random.PRNGKey(2), (batch, size, size, 3))

    import time

    s, m = step_fn(state, real)
    sync(s.g_params)
    t0 = time.time()
    for _ in range(steps):
        s, m = step_fn(s, real)
    sync(s.g_params)
    dt = (time.time() - t0) / steps
    print(f"train step {size}px B{batch}: {dt * 1e3:.1f} ms/step "
          f"({batch / dt:.1f} img/s)")


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:3]]
    main(*args)
