"""The jitted adversarial train step — one SPMD program per iteration.

Functional re-design of the reference hot loop (train.py:239-420):

- D step (logistic loss) on a fresh fake batch rendered from a freshly
  sampled 3DMM mesh (random face params -> vertices -> random rigid pose ->
  per-vertex normals, all outside the gradient like the reference's no_grad).
- ADA controller: accumulate sign(real_pred) stats; every `ada_every` reals
  nudge the augmentation probability toward the target r_t (train.py:269-280).
- lazy R1 every ``d_reg_every`` steps (grad-of-grad through D).
- G step (non-saturating loss).
- lazy path-length regularization every ``g_reg_every`` steps, over the
  per-layer latents AND the rasterized normal-map pyramid (the reference's
  multi-tensor extension, train.py:118-134/335-354) — grad-of-grad through
  the full synthesis network including the rasterizer's coefficient path.
- EMA update of G.

Multi-chip: the step is a pure function; run it under ``jax.jit`` with the
batch sharded over a ``Mesh('data')`` axis and params replicated — XLA GSPMD
inserts the gradient/metric all-reduces over ICI (no explicit collectives, no
process groups; the NCCL/DDP machinery of distributed.py:90-105 dissolves
into compiler-inserted psums).

The regularizer branches use ``lax.cond`` so one compiled step covers both
regularized and plain iterations with no recompilation.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import optax

from stylerenderer_tpu.face3d.geometry import mesh_point_normal, random_apply_pose3D
from stylerenderer_tpu.models.generator import _mix_styles
from stylerenderer_tpu.train import losses
from stylerenderer_tpu.train.state import TrainState, make_optimizers
from stylerenderer_tpu.utils.config import TrainConfig


def _sample_mesh(face, tri, rng, batch):
    """Random 3DMM sample -> posed vertices + normals (train.py:248-251)."""
    kf, kp = jax.random.split(rng)
    x = face.random_input(kf, batch)
    vert = random_apply_pose3D(kp, face(x))
    norm = mesh_point_normal(vert, tri)
    return jax.lax.stop_gradient(vert), jax.lax.stop_gradient(norm), x


def _sample_styles(rng, batch, latent_dim, mixing_prob, n_latent):
    """Two z's + mixing bernoulli + inject index, static shapes
    (train.py:135-144 semantics)."""
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    z1 = jax.random.normal(k1, (batch, latent_dim))
    z2 = jax.random.normal(k2, (batch, latent_dim))
    use_mix = jax.random.bernoulli(k3, mixing_prob)
    z2 = jnp.where(use_mix, z2, z1)
    # reference random.randint(1, n_latent-1) is INCLUSIVE of n_latent-1
    # (train.py:165-171 via model.py:255); jax.random.randint's upper bound is
    # exclusive, so it must be n_latent to sample the same support
    inject = jax.random.randint(k4, (), 1, max(n_latent, 2))
    return [z1, z2], inject


def sample_g_inputs(cfg, gen, face, tri, extra_heads, kg_style, kg_mesh, batch):
    """Sample the G-step styles + posed mesh with the reference's pairing rules
    (train.py:294-309):

    - ``feat`` head active: styles are sampled for the FIRST half only and the
      second half re-uses ``styles[:res]`` (train.py:297-298); the *shape*
      components of the 3DMM params are likewise copied across halves
      (train.py:299-300 ``sample_f[half:, :dim0] = sample_f[:res, :dim0]``) so
      pairs (i, half+i) share identity but get independent expression/pose.
    - ``lmk`` head active: after posing, interleaved pairs share the FULL
      posed geometry (train.py:306-308 ``vert[1::2] = vert[:res*2:2]``) —
      identical rasterized normal pyramids, different styles.
    """
    half = (batch + 1) // 2
    res = batch - half
    kf, kp = jax.random.split(kg_mesh)
    if "feat" in extra_heads:
        styles_g, inject_g = _sample_styles(
            kg_style, half, cfg.latent, cfg.mixing, gen.n_latent
        )
        styles_g = [jnp.concatenate([s, s[:res]], axis=0) for s in styles_g]
        face_x = face.random_input(kf, batch)
        dim0 = face.dim[0]
        face_x = face_x.at[half:, :dim0].set(face_x[:res, :dim0])
    else:
        styles_g, inject_g = _sample_styles(
            kg_style, batch, cfg.latent, cfg.mixing, gen.n_latent
        )
        face_x = face.random_input(kf, batch)
    vert_g = random_apply_pose3D(kp, face(face_x))
    norm_g = mesh_point_normal(vert_g, tri)
    if "lmk" in extra_heads:
        vert_g = vert_g.at[1::2].set(vert_g[: res * 2 : 2])
        norm_g = norm_g.at[1::2].set(norm_g[: res * 2 : 2])
    vert_g = jax.lax.stop_gradient(vert_g)
    norm_g = jax.lax.stop_gradient(norm_g)
    return styles_g, inject_g, vert_g, norm_g, face_x


def make_train_step(
    cfg: TrainConfig,
    gen,
    disc,
    face,
    tri,
    augment_fn: Callable | None = None,
    extra_heads=None,
):
    """Build the pure train-step function.

    augment_fn: optional ``(rng, img, p) -> img`` ADA augmentation pipeline.
    extra_heads: optional dict of frozen supervisor callables:
      'sfs': ``img -> normals [B,H,W,3]`` (shape-from-shading consistency),
      'feat': ``img -> embedding``      (identity consistency on paired geometry),
      'lmk': ``img -> landmarks``       (landmark consistency on paired geometry).
    """
    g_tx, d_tx = make_optimizers(cfg)
    extra_heads = extra_heads or {}
    ada_step_size = cfg.ada_target / cfg.ada_length

    def train_step(state: TrainState, real_img):
        metrics = {}
        rng, kd_style, kd_mesh, kd_noise, kd_aug_r, kd_aug_f = jax.random.split(
            state.rng, 6
        )
        rng, kg_style, kg_mesh, kg_noise, kg_aug = jax.random.split(rng, 5)
        rng, kp_style, kp_noise, kp_probe, kr_next = jax.random.split(rng, 5)
        batch = real_img.shape[0]

        # ---------------- D step (train.py:245-268) ----------------
        styles, inject = _sample_styles(
            kd_style, batch, cfg.latent, cfg.mixing, gen.n_latent
        )
        vert, norm, _ = _sample_mesh(face, tri, kd_mesh, batch)
        fake_img, _, _ = gen.apply(
            {"params": state.g_params}, styles, (vert, norm, tri),
            inject_index=inject, rngs={"noise": kd_noise},
        )
        fake_img = jax.lax.stop_gradient(fake_img)
        if cfg.augment and augment_fn is not None:
            real_aug = augment_fn(kd_aug_r, real_img, state.ada_p)
            fake_d = augment_fn(kd_aug_f, fake_img, state.ada_p)
        else:
            real_aug, fake_d = real_img, fake_img

        def d_loss_fn(dp):
            real_pred = disc.apply({"params": dp}, real_aug)
            fake_pred = disc.apply({"params": dp}, fake_d)
            loss = losses.d_logistic_loss(real_pred, fake_pred)
            return loss, (real_pred, fake_pred)

        (d_loss, (real_pred, fake_pred)), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True
        )(state.d_params)
        d_updates, d_opt = d_tx.update(d_grads, state.d_opt, state.d_params)
        d_params = optax.apply_updates(state.d_params, d_updates)
        metrics["d"] = d_loss
        metrics["real_score"] = jnp.mean(real_pred)
        metrics["fake_score"] = jnp.mean(fake_pred)

        # ---------------- ADA controller (train.py:269-280) ----------------
        ada_p, ada_signs, ada_count = state.ada_p, state.ada_signs, state.ada_count
        if cfg.augment and cfg.augment_p <= 0:
            ada_signs = ada_signs + jnp.sum(jnp.sign(real_pred))
            ada_count = ada_count + real_pred.shape[0]

            def ada_update(args):
                p, signs, count = args
                r_t = signs / count
                sgn = jnp.where(r_t > cfg.ada_target, 1.0, -1.0)
                p = jnp.clip(p + sgn * ada_step_size * count, 0.0, 1.0)
                return p, jnp.zeros(()), jnp.zeros(())

            ada_p, ada_signs, ada_count = jax.lax.cond(
                ada_count > cfg.ada_every - 1,
                ada_update,
                lambda a: a,
                (ada_p, ada_signs, ada_count),
            )
            metrics["r_t"] = jnp.where(
                state.ada_count > 0, state.ada_signs / state.ada_count, 0.0
            )
        else:
            metrics["r_t"] = jnp.zeros(())
        metrics["ada_p"] = ada_p

        # ---------------- lazy R1 (train.py:281-289) ----------------
        def do_r1(operand):
            dp, dopt = operand

            def r1_loss_fn(p):
                r1 = losses.r1_penalty(
                    lambda pp, img: disc.apply({"params": pp}, img), p, real_img
                )
                return cfg.r1 / 2.0 * r1 * cfg.d_reg_every, r1

            (_, r1), grads = jax.value_and_grad(r1_loss_fn, has_aux=True)(dp)
            updates, dopt = d_tx.update(grads, dopt, dp)
            return optax.apply_updates(dp, updates), dopt, r1

        def skip_r1(operand):
            dp, dopt = operand
            return dp, dopt, jnp.zeros(())

        d_params, d_opt, r1_val = jax.lax.cond(
            state.step % cfg.d_reg_every == 0, do_r1, skip_r1, (d_params, d_opt)
        )
        metrics["r1"] = r1_val

        # ---------------- G step (train.py:292-333) ----------------
        styles_g, inject_g, vert_g, norm_g, _ = sample_g_inputs(
            cfg, gen, face, tri, extra_heads, kg_style, kg_mesh, batch
        )

        def g_loss_fn(gp):
            fimg, _, norms = gen.apply(
                {"params": gp}, styles_g, (vert_g, norm_g, tri),
                inject_index=inject_g, return_normals=True,
                rngs={"noise": kg_noise},
            )
            fimg_d = fimg
            if cfg.augment and augment_fn is not None and "lmk" not in extra_heads:
                fimg_d = augment_fn(kg_aug, fimg, ada_p)
            pred = disc.apply({"params": d_params}, fimg_d)
            loss = losses.g_nonsaturating_loss(pred)
            aux = {}
            if "sfs" in extra_heads:
                nm = norms[-1]
                mask = (jnp.sum(nm * nm, -1, keepdims=True) > 1e-3).astype(nm.dtype)
                pred_n = extra_heads["sfs"](fimg)
                sfs = _smooth_l1(mask * pred_n, mask * nm)
                loss = loss + 0.01 * sfs
                aux["sfs"] = sfs
            if "feat" in extra_heads:
                half = (batch + 1) // 2
                res = batch - half
                feat = extra_heads["feat"](fimg)
                fl = jnp.mean((feat[:res] - feat[half:]) ** 2)
                loss = loss + 0.001 * fl
                aux["feature"] = fl
            if "lmk" in extra_heads:
                lmk = extra_heads["lmk"](fimg)
                half = (batch + 1) // 2
                res = batch - half
                ll = _smooth_l1(lmk[: res * 2 : 2], lmk[1::2])
                loss = loss + 1e-5 * ll
                aux["lmk"] = ll
            return loss, aux

        (g_loss, g_aux), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
            state.g_params
        )
        g_updates, g_opt = g_tx.update(g_grads, state.g_opt, state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)
        metrics["g"] = g_loss
        metrics.update(g_aux)

        # ---------------- lazy path-length reg (train.py:335-354) ----------------
        path_batch = max(1, batch // cfg.path_batch_shrink)

        def do_path(operand):
            gp, gopt, mpl = operand
            styles_p, inject_p = _sample_styles(
                kp_style, path_batch, cfg.latent, cfg.mixing, gen.n_latent
            )
            v_p = vert_g[:path_batch]
            n_p = norm_g[:path_batch]
            pyramid = gen.apply(
                {"params": gp}, (v_p, n_p, tri), method=gen.normal_pyramid
            )
            pyramid = [jax.lax.stop_gradient(m) for m in pyramid]

            def path_loss_fn(p):
                w = [
                    gen.apply({"params": p}, s, method=gen.get_latent)
                    for s in styles_p
                ]
                latent = _mix_styles(w, gen.n_latent, inject_p, None, None)

                def synth(latent_, *maps):
                    return gen.apply(
                        {"params": p}, latent_, list(maps),
                        method=gen.synthesize, rngs={"noise": kp_noise},
                    )

                pl = losses.path_lengths_multi(
                    synth, kp_probe, (latent, *pyramid)
                )
                penalty, new_mean = losses.path_regularize(pl, mpl)
                weighted = cfg.path_regularize * cfg.g_reg_every * penalty
                return weighted, (penalty, new_mean, jnp.mean(pl))

            (_, (penalty, new_mean, pl_mean)), grads = jax.value_and_grad(
                path_loss_fn, has_aux=True
            )(gp)
            updates, gopt = g_tx.update(grads, gopt, gp)
            return optax.apply_updates(gp, updates), gopt, new_mean, penalty, pl_mean

        def skip_path(operand):
            gp, gopt, mpl = operand
            return gp, gopt, mpl, jnp.zeros(()), jnp.zeros(())

        g_params, g_opt, mean_path_length, path_penalty, path_len = jax.lax.cond(
            state.step % cfg.g_reg_every == 0,
            do_path,
            skip_path,
            (g_params, g_opt, state.mean_path_length),
        )
        metrics["path"] = path_penalty
        metrics["path_length"] = path_len
        metrics["mean_path_length"] = mean_path_length

        # ---------------- EMA (train.py:100-104, 358) ----------------
        decay = cfg.ema_decay
        g_ema = jax.tree_util.tree_map(
            lambda e, p: e * decay + p * (1.0 - decay), state.g_ema, g_params
        )

        # ---------------- in-jit finite screen (SURVEY.md §5.3) ----------------
        # If any metric or any updated parameter is non-finite, discard the
        # whole update on-device (params/opt/EMA keep their previous values) so
        # a NaN step can never poison the state — no host round-trip needed.
        # The reference has no such guard (a NaN run trains on garbage).
        flags = [jnp.isfinite(v) for v in metrics.values()]
        flags += [
            jnp.all(jnp.isfinite(l))
            for l in jax.tree_util.tree_leaves((g_params, d_params))
        ]
        finite = jnp.all(jnp.stack([jnp.all(f) for f in flags]))

        def keep(new, old):
            return jax.tree_util.tree_map(
                lambda n, o: jnp.where(finite, n, o), new, old
            )

        new_state = state.replace(
            g_params=keep(g_params, state.g_params),
            d_params=keep(d_params, state.d_params),
            g_ema=keep(g_ema, state.g_ema),
            g_opt=keep(g_opt, state.g_opt),
            d_opt=keep(d_opt, state.d_opt),
            step=state.step + finite.astype(jnp.int32),
            mean_path_length=keep(mean_path_length, state.mean_path_length),
            ada_p=keep(ada_p, state.ada_p),
            ada_signs=keep(ada_signs, state.ada_signs),
            ada_count=keep(ada_count, state.ada_count),
            rng=kr_next,  # always advance so a dropped step retries new noise
            nonfinite_count=state.nonfinite_count + (1 - finite.astype(jnp.int32)),
        )
        metrics["nonfinite_steps"] = new_state.nonfinite_count
        return new_state, metrics

    return train_step


def _smooth_l1(a, b):
    d = jnp.abs(a - b)
    return jnp.mean(jnp.where(d < 1.0, 0.5 * d * d, d - 0.5))
