"""One-command real-weight metric parity runbook (VERDICT r4 #8).

The only blocker to FID/PPL/LPIPS parity with the PyTorch reference is
environmental: the published backbone weights cannot be downloaded in this
offline image (FID Inception: pt_inception-2015-12-05, reference
inception.py:13; LPIPS vgg16: torchvision, reference
lpips/pretrained_networks.py). The converters and protocol ports exist and
are cross-validated against torch mirrors (tests/test_eval_fidelity.py).
This script turns "weights appeared" into one command:

  python scripts/parity_eval.py \
      --inception /path/pt_inception-2015-12-05.pth \
      --vgg /path/vgg16_torchvision.pth \
      --ckpt train_demo256/checkpoint --data train_demo256/faces256.srpack \
      --size 256 --with_map --out parity_eval.json

It then (1) AUDITS each conversion numerically — the torch state dict is run
through the in-repo torch mirror of the reference network and compared
feature-by-feature against the flax port loaded with the converted weights —
and (2) executes the reference's exact metric protocols with the real
weights:

  - FID:  real mu/cov over --data, 50k generator samples, FID-InceptionV3
          pool3 (reference fid.py:54-55, calc_inception.py:55-107).
  - PPL:  5k samples, eps=1e-4, W-space end sampling, LPIPS net-lin vgg with
          the published v0.1 linear heads, center-crop, 1-99 percentile
          filter (reference ppl.py:102-107,138-180).
  - LPIPS: mean distance over fixed dataset pairs — a stable scalar to diff
          against the same loop run with the reference's torch LPIPS.

``--dry_run`` exercises the ENTIRE pipeline with randomized weights (the
torch mirrors' state dicts stand in for the missing published files) at toy
scale, so the runbook itself stays verified while the weights are
unreachable: tests/test_parity_eval.py runs it on CPU.
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
import sys
import time

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)


def _load_mirrors():
    """Import the torch mirrors of the reference nets from the test module
    (single source of truth for the mirror architectures)."""
    path = os.path.join(REPO, "tests", "test_eval_fidelity.py")
    spec = importlib.util.spec_from_file_location("eval_fidelity_mirrors", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def audit_inception(weights_path: str, mirrors) -> dict:
    """Run the torch FID-Inception mirror and the flax port on the same
    inputs + weights; report the feature agreement."""
    import jax
    import numpy as np
    import torch

    from stylerenderer_tpu.eval.inception import (
        InceptionV3, load_torch_inception_weights,
    )

    tnet = mirrors.TFIDInception().eval()
    sd = torch.load(weights_path, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    missing, unexpected = tnet.load_state_dict(sd, strict=False)
    model = InceptionV3()
    params = model.init(jax.random.PRNGKey(0), np.zeros((1, 64, 64, 3), "f"))
    params = load_torch_inception_weights(weights_path, params["params"])

    x = np.random.default_rng(0).standard_normal((4, 299, 299, 3)).astype("f")
    with torch.no_grad():
        ref = tnet(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(model.apply({"params": params}, x))
    denom = np.maximum(np.abs(ref), 1e-3)
    return {
        "max_abs_diff": float(np.abs(got - ref).max()),
        "max_rel_diff": float((np.abs(got - ref) / denom).max()),
        "missing_keys": len(missing),
        "unexpected_keys": len(unexpected),
    }


def audit_vgg(weights_path: str, lin_path: str | None, mirrors) -> dict:
    """Same audit for the LPIPS vgg backbone: compare the 5 slice taps of the
    torch mirror against the flax VGG16Features given the same state dict."""
    import jax
    import numpy as np
    import torch

    from stylerenderer_tpu.eval.lpips import load_lpips

    tnet = mirrors.TVGG16Features().eval()
    sd = torch.load(weights_path, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    missing, unexpected = tnet.load_state_dict(sd, strict=False)

    apply_fn, params = load_lpips(
        "vgg", backbone_weights=weights_path, linear_weights=lin_path
    )
    rng = np.random.default_rng(1)
    a = rng.uniform(-1, 1, (2, 64, 64, 3)).astype("f")
    b = rng.uniform(-1, 1, (2, 64, 64, 3)).astype("f")
    got = np.asarray(apply_fn(params, a, b))
    chans = (64, 128, 256, 512, 512)
    if lin_path:
        lin_sd = torch.load(lin_path, map_location="cpu")
        lins = [lin_sd[f"lin{i}.model.1.weight"].reshape(-1).clamp(min=0)
                for i in range(5)]
    else:  # flax port defaults: constant 1/C heads (lpips.py LPIPS.__call__)
        lins = [torch.full((c,), 1.0 / c) for c in chans]
    with torch.no_grad():
        ref = mirrors._t_pnetlin(
            tnet, lins,
            torch.from_numpy(a.transpose(0, 3, 1, 2)),
            torch.from_numpy(b.transpose(0, 3, 1, 2)),
        ).numpy()
    return {
        "lpips_flax": [float(v) for v in got],
        "lpips_torch": [float(v) for v in ref],
        "max_abs_diff": float(np.abs(got - np.asarray(ref)).max()),
        "missing_keys": len(missing),
        "unexpected_keys": len(unexpected),
    }


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--inception", type=str, default="",
                   help="pt_inception-2015-12-05 state dict (.pth)")
    p.add_argument("--vgg", type=str, default="",
                   help="torchvision vgg16 state dict (.pth)")
    p.add_argument("--lpips_lin", type=str,
                   default="/root/reference/lpips/weights/v0.1/vgg.pth",
                   help="published LPIPS v0.1 linear heads")
    p.add_argument("--ckpt", type=str, default="",
                   help="orbax checkpoint dir (empty: random-init generator)")
    p.add_argument("--data", type=str, default="",
                   help="SRPack shard or image folder for real stats")
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--latent", type=int, default=512)
    p.add_argument("--n_mlp", type=int, default=8)
    p.add_argument("--with_map", action="store_true")
    p.add_argument("--bfm", type=str, default="")
    p.add_argument("--n_fid", type=int, default=50_000)
    p.add_argument("--n_ppl", type=int, default=5_000)
    p.add_argument("--n_lpips_pairs", type=int, default=64)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", type=str, default="parity_eval.json")
    p.add_argument("--dry_run", action="store_true",
                   help="randomized stand-in weights + toy scale: verifies "
                        "the runbook end to end without the published files")
    args = p.parse_args(argv)

    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np

    mirrors = _load_mirrors()
    report: dict = {"protocol": {
        "fid": "real mu/cov + N generator samples, FID-InceptionV3 pool3 "
               "(reference fid.py:54-55)",
        "ppl": "N samples, eps=1e-4, W end, LPIPS net-lin vgg v0.1, crop, "
               "1-99 pct filter (reference ppl.py:102-107)",
        "lpips": "mean over fixed dataset pairs",
    }}

    tmpdir = None
    if args.dry_run:
        import tempfile

        import torch

        tmpdir = tempfile.mkdtemp(prefix="parity_dry_")
        # randomized stand-ins in the exact published state-dict formats
        tnet = mirrors.TFIDInception()
        mirrors._randomize_bn_stats(tnet, seed=0)
        args.inception = os.path.join(tmpdir, "inception_random.pth")
        torch.save(tnet.state_dict(), args.inception)
        vnet = mirrors.TVGG16Features()
        args.vgg = os.path.join(tmpdir, "vgg_random.pth")
        torch.save(vnet.state_dict(), args.vgg)
        if not os.path.exists(args.lpips_lin):
            lin = {f"lin{i}.model.1.weight":
                   torch.rand(1, c, 1, 1)
                   for i, c in enumerate([64, 128, 256, 512, 512])}
            args.lpips_lin = os.path.join(tmpdir, "lin_random.pth")
            torch.save(lin, args.lpips_lin)
        if not args.data:
            from stylerenderer_tpu.data.synth import write_synth_dataset

            args.data = os.path.join(tmpdir, "synth.srpack")
            write_synth_dataset(args.data, n=48, size=args.size)
        args.n_fid = min(args.n_fid, 32)
        args.n_ppl = min(args.n_ppl, 16)
        args.n_lpips_pairs = min(args.n_lpips_pairs, 8)
        args.batch = min(args.batch, 8)
        report["dry_run"] = True

    if not os.path.exists(args.lpips_lin):
        args.lpips_lin = None

    # ---- stage 1: conversion audits ----
    t0 = time.time()
    if args.inception:
        report["audit_inception"] = audit_inception(args.inception, mirrors)
        ok = report["audit_inception"]["max_rel_diff"] < 1e-3
        report["audit_inception"]["ok"] = bool(ok)
        print(f"inception conversion audit: {report['audit_inception']}",
              flush=True)
    if args.vgg:
        report["audit_vgg_lpips"] = audit_vgg(args.vgg, args.lpips_lin,
                                              mirrors)
        ok = report["audit_vgg_lpips"]["max_abs_diff"] < 1e-4
        report["audit_vgg_lpips"]["ok"] = bool(ok)
        print(f"vgg/lpips conversion audit: {report['audit_vgg_lpips']}",
              flush=True)
    report["audit_seconds"] = round(time.time() - t0, 1)

    # ---- stage 2: generator under test ----
    from stylerenderer_tpu.eval import (
        compute_fid, compute_ppl, extract_features_from_dataset,
        extract_features_from_samples, feature_stats, load_lpips,
        load_patched_inception_v3, make_ppl_sampler,
    )
    from stylerenderer_tpu.face3d import (
        load_bfm, mesh_point_normal, random_apply_pose3D, synthetic_face,
    )
    from stylerenderer_tpu.models import Generator, GeneratorWithMap

    if args.with_map:
        gen = GeneratorWithMap(args.size, args.latent, args.n_mlp)
        face, tri = (load_bfm(args.bfm) if args.bfm
                     else synthetic_face(48, 96, 80, 29))
    else:
        gen = Generator(args.size, args.latent, args.n_mlp)
        face = tri = None

    if args.ckpt:
        from stylerenderer_tpu.utils.checkpoint import load_params_only

        state, _ = load_params_only(args.ckpt)
        params = state.get("g_ema", state.get("g_params"))
        params = jax.tree_util.tree_map(jnp.asarray, params)
    else:
        kz = jax.random.PRNGKey(7)
        dummy_z = [jnp.zeros((1, args.latent))]
        if args.with_map:
            x0 = face.random_input(kz, 1)
            v0 = face(x0)
            mesh0 = (v0, mesh_point_normal(v0, tri), tri)
            params = gen.init({"params": kz, "noise": kz}, dummy_z,
                              mesh0)["params"]
        else:
            params = gen.init({"params": kz, "noise": kz}, dummy_z)["params"]
        report["generator"] = "random init (no --ckpt)"

    @functools.partial(jax.jit, static_argnums=(1,))
    def sample_fn(rng, batch):
        kz, km, kp, kn = jax.random.split(rng, 4)
        z = jax.random.normal(kz, (batch, args.latent))
        if args.with_map:
            x = face.random_input(km, batch)
            vert = random_apply_pose3D(kp, face(x))
            norm = mesh_point_normal(vert, tri)
            img, _, _ = gen.apply({"params": params}, [z], (vert, norm, tri),
                                  rngs={"noise": kn})
        else:
            img, _ = gen.apply({"params": params}, [z], rngs={"noise": kn})
        return img

    # ---- stage 3: FID (reference fid.py protocol) ----
    if args.data:
        from stylerenderer_tpu.data import (
            ImageFolderDataset, SRPackDataset, prefetch_batches,
        )

        t0 = time.time()
        model, inc_params = load_patched_inception_v3(args.inception or None)
        inc_apply = jax.jit(lambda x: model.apply({"params": inc_params}, x))
        ds = (ImageFolderDataset(args.data, resolution=args.size)
              if os.path.isdir(args.data)
              else SRPackDataset(args.data, resolution=args.size))
        n_real = min(args.n_fid, len(ds))
        it = prefetch_batches(ds, args.batch, train=False, drop_last=True)
        real_feats = extract_features_from_dataset(it, inc_apply, n_real)
        real_mu, real_cov = feature_stats(real_feats)
        fake_feats = extract_features_from_samples(
            sample_fn, inc_apply, args.n_fid, args.batch,
            jax.random.PRNGKey(args.seed),
        )
        report["fid"] = {
            "value": float(compute_fid(fake_feats, real_mu, real_cov)),
            "n_real": int(n_real), "n_fake": int(args.n_fid),
            "pretrained_inception": bool(args.inception),
            "seconds": round(time.time() - t0, 1),
        }
        print(f"fid: {report['fid']}", flush=True)

    # ---- stage 4: PPL (reference ppl.py protocol) ----
    t0 = time.time()
    lpips_apply, lpips_params = load_lpips(
        "vgg", backbone_weights=args.vgg or None,
        linear_weights=args.lpips_lin,
    )

    def map_fn(z):
        return gen.apply({"params": params}, z, method=gen.get_latent)

    mesh = None
    if args.with_map:
        k1, k2 = jax.random.split(jax.random.PRNGKey(1))
        x = face.random_input(k1, args.batch)
        vert = random_apply_pose3D(k2, face(x))
        mesh = (vert, mesh_point_normal(vert, tri), tri)

    def synth_fn(latents, input_is_latent):
        kwargs = dict(input_is_latent=input_is_latent,
                      rngs={"noise": jax.random.PRNGKey(0)})
        if mesh is not None:
            return gen.apply({"params": params}, [latents], mesh, **kwargs)[0]
        return gen.apply({"params": params}, [latents], **kwargs)[0]

    sampler = jax.jit(
        make_ppl_sampler(
            map_fn, synth_fn,
            lambda a, b: lpips_apply(lpips_params, a, b),
            args.latent, space="w", sampling="end", eps=1e-4,
            crop=args.size >= 256,
        ),
        static_argnums=(1,),
    )
    report["ppl"] = {
        "value": float(compute_ppl(sampler, jax.random.PRNGKey(args.seed),
                                   args.n_ppl, args.batch)),
        "n_sample": int(args.n_ppl),
        "pretrained_vgg": bool(args.vgg),
        "published_linear_heads": bool(args.lpips_lin),
        "seconds": round(time.time() - t0, 1),
    }
    print(f"ppl: {report['ppl']}", flush=True)

    # ---- stage 5: LPIPS scalar over fixed dataset pairs ----
    if args.data:
        from stylerenderer_tpu.data import SRPackDataset, ImageFolderDataset

        ds = (ImageFolderDataset(args.data, resolution=args.size)
              if os.path.isdir(args.data)
              else SRPackDataset(args.data, resolution=args.size))
        n = min(2 * args.n_lpips_pairs, len(ds) - len(ds) % 2)
        imgs = np.stack([np.asarray(ds[i]) for i in range(n)])
        imgs = imgs.astype(np.float32) / 127.5 - 1.0
        a, b = imgs[0::2], imgs[1::2]
        d = np.asarray(lpips_apply(lpips_params, a, b))
        report["lpips_fixed_pairs"] = {
            "mean": float(d.mean()), "n_pairs": int(len(d)),
            "seed_note": "pairs (2i, 2i+1) of the dataset in index order",
        }
        print(f"lpips fixed pairs: {report['lpips_fixed_pairs']}", flush=True)

    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {args.out}")
    return report


if __name__ == "__main__":
    main()
