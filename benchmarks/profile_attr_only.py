"""Time ONLY the 5-level attr-mode pipeline (bins + kernel + recompute) —
for quick kernel-variant A/B runs without recompiling the other sections.

python benchmarks/profile_attr_only.py [batch] [iters]
"""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from benchmarks.common import production_face
from benchmarks.profile_fused import timed


def main(B=16, iters=10):
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from stylerenderer_tpu.ops.rasterize_pallas import (
        rasterize_winners_pallas_multi,
    )

    face, tri, vert, norm = production_face(B)
    print(f"B={B} nf={tri.shape[0]}", flush=True)

    def attr_mode(v):
        outs = rasterize_winners_pallas_multi(v, tri, 256, 5, attrs=norm)
        return sum(jnp.mean(va) for va, _ in outs)

    timed(attr_mode, vert, iters, "bins + kernel + recompute (attr)")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 16,
         int(sys.argv[2]) if len(sys.argv) > 2 else 10)
