"""Synthetic shaded-face dataset: a learnable stand-in for FFHQ-style photos
when no real data ships with the image (BASELINE.md training demo).

Each sample: random 3DMM face + random rigid pose -> rasterized per-pixel
normals -> Lambertian shading with a random directional light + random
skin-ish albedo + ambient, solid background. The distribution is exactly
renderable by the GAR (geometry-conditioned), so adversarial training has a
true optimum and loss/FID trends demonstrate learning
(reference behavior being demonstrated: /root/reference/train.py:178-420).
"""

from __future__ import annotations

import numpy as np


def make_synth_batch(rng_key, face, tri, size: int, batch: int):
    """jit-able: render ``batch`` shaded faces [B, size, size, 3] in [0, 1]."""
    import jax
    import jax.numpy as jnp

    from stylerenderer_tpu.face3d import mesh_point_normal, random_apply_pose3D
    from stylerenderer_tpu.ops import rasterize

    kf, kp, kl, ka, kb = jax.random.split(rng_key, 5)
    x = face.random_input(kf, batch)
    vert = random_apply_pose3D(kp, face(x))
    norm = mesh_point_normal(vert, tri)
    nmap = rasterize(vert, norm, tri, size, size)  # [B,H,W,3]
    mask = (jnp.sum(nmap * nmap, -1, keepdims=True) > 1e-6).astype(jnp.float32)
    n = nmap / jnp.maximum(jnp.linalg.norm(nmap, axis=-1, keepdims=True), 1e-6)

    light = jax.random.normal(kl, (batch, 3))
    light = light / jnp.linalg.norm(light, axis=-1, keepdims=True)
    # bias lights toward the camera (+z) so faces are lit
    light = light.at[:, 2].set(jnp.abs(light[:, 2]) + 0.5)
    light = light / jnp.linalg.norm(light, axis=-1, keepdims=True)
    diffuse = jnp.maximum(jnp.einsum("bhwc,bc->bhw", n, light), 0.0)[..., None]

    albedo = jax.random.uniform(
        ka, (batch, 1, 1, 3),
        minval=jnp.asarray([0.55, 0.35, 0.25]),
        maxval=jnp.asarray([0.95, 0.75, 0.65]),
    )
    bg = jax.random.uniform(kb, (batch, 1, 1, 3), minval=0.05, maxval=0.35)
    img = albedo * (0.25 + 0.75 * diffuse)
    return jnp.clip(mask * img + (1 - mask) * bg, 0.0, 1.0)


def write_synth_dataset(path: str, n: int, size: int = 64, seed: int = 0,
                        batch: int = 64, face=None, tri=None) -> int:
    """Render ``n`` shaded faces and write them as a raw SRPack shard."""
    import jax

    from stylerenderer_tpu.data.srpack import SRPackWriter
    from stylerenderer_tpu.face3d import synthetic_face

    if face is None:
        face, tri = synthetic_face(48, 96, 80, 29)
    render = jax.jit(
        lambda k: make_synth_batch(k, face, tri, size, batch)
    )
    writer = SRPackWriter(path, [size], codec="raw")
    done = 0
    key = jax.random.PRNGKey(seed)
    while done < n:
        key, k = jax.random.split(key)
        imgs = np.asarray(render(k))
        take = min(batch, n - done)
        for i in range(take):
            writer.add([np.asarray(imgs[i] * 255.0, np.uint8)])
        done += take
    return writer.finalize()


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description="render a synthetic face SRPack")
    p.add_argument("out", type=str)
    p.add_argument("--n", type=int, default=10_000)
    p.add_argument("--size", type=int, default=64)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)
    n = write_synth_dataset(args.out, args.n, args.size, args.seed)
    print(f"wrote {n} {args.size}px shaded faces -> {args.out}")


if __name__ == "__main__":
    main()
