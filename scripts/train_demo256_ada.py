"""ADA at production resolution (VERDICT r4 #6): run 256², batch-16
training steps WITH the ADA controller — the reference's protocol trains
with ADA on (/root/reference/train.py:473-484) and round 4 only ever
exercised it at 64px on chip. Demonstrates on hardware that at 256px
ada_p moves off zero under the sign(real_pred) heuristic and r_t behaves.

Resumes the train_demo256 checkpoint when it exists locally; otherwise
(the checkpoint is .gitignored — a fresh workspace has only the committed
logs/samples) trains from scratch, which matches the reference protocol
even more closely (ADA is on from step 0 there).

``--ada_length`` defaults to 30k images (reference default is 500k) so the
controller's response is visible within a 2k-step demonstration: the step
size is ada_target/ada_length per real image, so 500k would cap p at ~0.04
over this run — the short length changes the controller's GAIN, not its
mechanism.

Also backfills the 256px runs' FID trends (random-backbone inception — the
TREND is the signal; published weights don't ship offline), which the 64px
demo has and train_demo256 lacked.

Artifacts -> train_demo256_ada/{logs, sample, checkpoint, curves.png,
ada_summary.json} and train_demo256/fid_trend.json.

python scripts/train_demo256_ada.py [--steps 2000]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

BASE = os.path.join(os.path.dirname(__file__), "..", "train_demo256")
OUT = os.path.join(os.path.dirname(__file__), "..", "train_demo256_ada")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--ada_length", type=int, default=30_000)
    p.add_argument("--skip_train", action="store_true")
    p.add_argument("--skip_fid", action="store_true")
    p.add_argument("--n_data", type=int, default=2000)
    args = p.parse_args()
    base = os.path.abspath(BASE)
    out = os.path.abspath(OUT)
    data = os.path.join(base, "faces256.srpack")

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    if not os.path.exists(data):
        from stylerenderer_tpu.data.synth import write_synth_dataset

        print(f"rendering {args.n_data} synthetic 256px faces -> {data}",
              flush=True)
        os.makedirs(base, exist_ok=True)
        write_synth_dataset(data, args.n_data, size=256, batch=16)

    if not args.skip_train:
        from stylerenderer_tpu.utils.checkpoint import latest_step

        ckpt_dir = os.path.join(base, "checkpoint")
        start = (latest_step(ckpt_dir) or 0) if os.path.isdir(ckpt_dir) else 0
        from stylerenderer_tpu.cli.train import main as train_main

        train_main([
            data, "--size", "256", "--batch", str(args.batch),
            "--iter", str(start + args.steps), "--seed", "23",
            "--compute_dtype", "bfloat16",
            *(["--ckpt", ckpt_dir] if start else []),
            "--augment", "--ada_length", str(args.ada_length),
            "--ckpt_every", str(args.steps), "--ckpt_keep", "2",
            "--sample_every", str(max(args.steps // 4, 1)),
            "--log_every", "25", "--n_sample", "8",
            "--out_dir", out,
        ])

    # summarize the controller's trajectory from the metrics log
    rows = []
    logs_dir = os.path.join(out, "logs")
    for lf in sorted(os.listdir(logs_dir)):
        if lf.endswith(".jsonl"):
            with open(os.path.join(logs_dir, lf)) as f:
                for line in f:
                    try:
                        rows.append(json.loads(line))
                    except json.JSONDecodeError:
                        pass
    rows.sort(key=lambda r: r.get("step", 0))
    ada = [(r["step"], r["ada_p"], r["r_t"]) for r in rows if "ada_p" in r]
    summary = {
        "steps": len(ada),
        "ada_p_first": ada[0][1] if ada else None,
        "ada_p_last": ada[-1][1] if ada else None,
        "ada_p_max": max(a[1] for a in ada) if ada else None,
        "r_t_last": ada[-1][2] if ada else None,
        "ada_length": args.ada_length,
        "note": "resumed from train_demo256 @3k steps; reference ADA "
                "protocol train.py:473-484; short ada_length = higher "
                "controller gain for a 2k-step demonstration",
    }
    with open(os.path.join(out, "ada_summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary, indent=1))
    assert summary["ada_p_max"] and summary["ada_p_max"] > 0.0, \
        "ada_p never moved"

    from scripts.train_demo import fid_trend, plot

    plot(out, title="256px + ADA (resumed from 3k)")
    if not args.skip_fid:
        # backfill the base run's FID trend when its checkpoints are still
        # on disk (they are .gitignored, so a fresh workspace lacks them)
        if os.path.isdir(os.path.join(base, "checkpoint")):
            fid_trend(base, data, size=256, n_sample=2000)
            plot(base, title="256px, batch 16, synthetic faces")
        fid_trend(out, data, size=256, n_sample=2000)
        plot(out, title="256px + ADA (resumed from 3k)")


if __name__ == "__main__":
    main()
