"""Regressions for the production-inversion non-finite state (round-2 open
item): geometry parameters died by iter ~16 of the 300-iter production bench.

Two mechanisms, each pinned by a direct unit test plus a mid-density
end-to-end run:

1. sliver-coefficient blow-up — for a high-aspect triangle at production
   coordinate scale the per-pixel barycentric normalizer ``s = r0+r1+r2``
   is a catastrophic f32 cancellation (terms ~1e4 summing to ~det ~ 1e-6),
   so the recomputed coefficients and their vertex gradients were unbounded
   (reference rasterize.h:81-86 divides unguarded and shares this failure
   mode). Fixed by the [-1, 2] coefficient clamp in
   ``rasterize._eval_candidate`` (no-op for well-conditioned pixels).
2. exactly-zero normals — ``mesh_point_normal`` of a vertex with no
   incident area has gradient 0 * d(sqrt)/dx|_0 = NaN unless the norm clamp
   sits INSIDE the sqrt (``face3d/geometry.py::normalize``).
"""

import numpy as np
import jax
import jax.numpy as jnp

from stylerenderer_tpu.face3d import mesh_point_normal, synthetic_face
from stylerenderer_tpu.face3d.geometry import normalize
from stylerenderer_tpu.ops.rasterize import winner_coeff


def test_sliver_coeff_clamped_and_grad_finite():
    """A 100px-long, sub-ulp-thin sliver: unclamped recompute produced
    coefficients ~1e3+ with matching gradient explosions."""
    h = w = 256
    # NDC such that px spans ~[100, 200], py ~156, area*2 ~ 3e-6 px^2
    def ndc(px, py):
        return ((px + 0.5) / (w / 2) - 1.0, 1.0 - (py + 0.5) / (h / 2))

    x0, y0 = ndc(100.0, 156.0)
    x1, y1 = ndc(200.0, 156.0 + 3e-8)
    x2, y2 = ndc(150.0, 156.0 - 3e-8)
    v = jnp.asarray(
        [[[x0, y0, -1.0], [x1, y1, -1.0], [x2, y2, -1.0]]], jnp.float32
    )
    tri = jnp.asarray([[0, 1, 2]], jnp.int32)
    # force the sliver as winner over its whole bbox row (exactly how the
    # production path consumes winner maps: search under stop_gradient,
    # differentiable recompute at the winning pixels)
    win = jnp.full((1, h, w), -1, jnp.int32)
    win = win.at[0, 156, 100:200].set(0)

    def f(v):
        coeff, _ = winner_coeff(v, tri, win, h, w)
        return coeff

    coeff = f(v)
    assert np.isfinite(np.asarray(coeff)).all()
    assert np.abs(np.asarray(coeff)).max() <= 2.0 + 1e-6

    g = jax.grad(lambda v: jnp.sum(f(v) * 3.7))(v)
    g = np.asarray(g)
    assert np.isfinite(g).all()
    # clamped coefficients bound the gradient too (pixels in the clamped
    # regime contribute zero; the rest are well-conditioned)
    assert np.abs(g).max() < 1e8


def test_zero_normal_gradient_finite():
    """Vertex 3 is referenced by no triangle -> its accumulated normal is
    exactly zero; the normalize gradient must not be NaN."""
    v = jnp.asarray(
        [[[0.0, 0, 0], [1, 0, 0], [0, 1, 0], [5.0, 5.0, 5.0]]], jnp.float32
    )
    tri = jnp.asarray([[0, 1, 2]], jnp.int32)

    def f(v):
        return jnp.sum(mesh_point_normal(v, tri) ** 2)

    g = np.asarray(jax.grad(f)(v))
    assert np.isfinite(g).all()


def test_normalize_value_identical_to_clamped_norm():
    """sqrt(max(n2, eps^2)) == max(sqrt(n2), eps) exactly (the fix changes
    gradients only)."""
    rng = np.random.RandomState(0)
    x = rng.randn(64, 3).astype(np.float32) * np.logspace(
        -12, 3, 64
    ).astype(np.float32)[:, None]
    got = np.asarray(normalize(jnp.asarray(x)))
    n = np.maximum(np.sqrt((x**2).sum(-1, keepdims=True)), 1e-8)
    np.testing.assert_array_equal(got, (x / n).astype(np.float32))


def test_mid_density_inversion_stays_finite():
    """End-to-end geometry-path regression at mid triangle density (the
    round-2 failure appeared only beyond the tiny-mesh configs the tests
    covered): ~5k triangles, 32px, pixel+landmark losses, 20 iters."""
    from stylerenderer_tpu.inversion import ProjectorConfig, make_projector
    from stylerenderer_tpu.models import GeneratorWithMap

    gen = GeneratorWithMap(32, 32, 2, channel_multiplier=1)
    face, tri = synthetic_face(40, 64, shape_dim=8, expression_dim=4)
    x = face.random_input(jax.random.PRNGKey(1), 1)
    vert = face(x)
    norm = mesh_point_normal(vert, tri)
    z = jax.random.normal(jax.random.PRNGKey(0), (1, 32))
    variables = gen.init(
        {"params": jax.random.PRNGKey(2), "noise": jax.random.PRNGKey(3)},
        [z], (vert, norm, tri),
    )
    nv = vert.shape[1]
    lmk_vidx = jnp.linspace(0, nv - 1, 16).astype(jnp.int32)
    cfg = ProjectorConfig(iters=20, lr=0.1, lr_geom=0.02, w_lpips=0.0,
                          w_lmk=1e-3)
    project = jax.jit(
        make_projector(gen, variables["params"], face, tri, cfg,
                       lmk_vidx=lmk_vidx)
    )
    target = jnp.zeros((1, 32, 32, 3))
    target_lmk = jnp.full((1, 16, 2), 16.0)
    out = project(jax.random.PRNGKey(4), target, target_lmk)
    hist = np.asarray(out["loss_history"])
    assert np.isfinite(hist).all(), hist
    for k, val in out["losses"].items():
        assert np.isfinite(float(val)), (k, float(val))
    assert np.isfinite(np.asarray(out["face_params"])).all()
    assert np.isfinite(np.asarray(out["vertices"])).all()
