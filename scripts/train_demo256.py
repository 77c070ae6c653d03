"""Production-resolution training demonstration (VERDICT r2 next-step #5):
the reference's defining workload is 256², batch 16
(/root/reference/train.py:428-440). This runs the full train step — Pallas
rasterizer forward+backward inside G's graph, lazy R1 + path-length
grad-of-grad, ADA, EMA, in-jit finite screen — at 256px on the chip for a
few thousand steps on synthetic shaded-face data, proving the
production-resolution loop is stable, and records sustained img/s.

Artifacts -> train_demo256/{logs, sample, checkpoint, curves.png}. The
256px SRPack dataset (~400 MB raw) is generated locally and NOT committed
(.gitignore); everything else is.

python scripts/train_demo256.py [--steps 3000] [--batch 16]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

OUT = os.path.join(os.path.dirname(__file__), "..", "train_demo256")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=3000)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--n_data", type=int, default=2000)
    p.add_argument("--skip_train", action="store_true")
    args = p.parse_args()
    out = os.path.abspath(OUT)
    os.makedirs(out, exist_ok=True)

    data = os.path.join(out, "faces256.srpack")
    if not os.path.exists(data):
        import jax

        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        from stylerenderer_tpu.data.synth import write_synth_dataset

        print(f"rendering {args.n_data} synthetic 256px faces -> {data}",
              flush=True)
        write_synth_dataset(data, args.n_data, size=256, batch=16)

    if not args.skip_train:
        from stylerenderer_tpu.cli.train import main as train_main

        train_main([
            data, "--size", "256", "--batch", str(args.batch),
            "--iter", str(args.steps), "--seed", "17",
            "--compute_dtype", "bfloat16",
            "--ckpt_every", str(max(args.steps // 3, 1)), "--ckpt_keep", "3",
            "--sample_every", str(max(args.steps // 6, 1)),
            "--log_every", "25", "--n_sample", "8",
            "--out_dir", out,
        ])

    from scripts.train_demo import plot

    plot(out, title="256px, batch 16, synthetic faces")


if __name__ == "__main__":
    main()
