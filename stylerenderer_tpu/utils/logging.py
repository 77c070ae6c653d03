"""Metrics logging + step profiling (SURVEY.md §5.1/§5.5).

The reference's three-tier TF1/tensorboardX/txt fallback (train.py:39-96)
becomes: JSONL always (machine-readable, crash-safe append), tensorboardX if
importable, wandb if importable and requested. ``StepTimer`` replaces the
broken tic/toc (train.py:26-38) with a working wall-clock/images-per-sec
tracker; ``trace_ctx`` wraps ``jax.profiler`` annotations."""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Any


class MetricsLogger:
    def __init__(self, log_dir: str, use_wandb: bool = False, project: str = "stylerenderer-tpu"):
        os.makedirs(log_dir, exist_ok=True)
        # raw O_APPEND fd: one atomic write syscall per row, no Python-level
        # buffering state (a 24k-step run on this image once lost the jsonl
        # tail after ~18k steps with a buffered file object; os.write is
        # immune to whatever stopped that stream)
        self._fd = os.open(
            os.path.join(log_dir, "metrics.jsonl"),
            os.O_WRONLY | os.O_CREAT | os.O_APPEND, 0o644,
        )
        self._tb = None
        try:
            import tensorboardX

            self._tb = tensorboardX.SummaryWriter(logdir=log_dir)
        except ImportError:
            pass
        self._wandb = None
        if use_wandb:
            try:
                import wandb

                wandb.init(project=project)
                self._wandb = wandb
            except ImportError:
                pass

    def log(self, step: int, data: dict[str, Any]):
        clean = {}
        for k, v in data.items():
            try:
                clean[k] = float(v)
            except (TypeError, ValueError):
                continue
        line = (json.dumps({"step": int(step), **clean}) + "\n").encode()
        # os.write may write short (signal interruption / full fs) — loop so a
        # metrics row is never silently truncated; ENOSPC etc. raise
        view = memoryview(line)
        while view:
            view = view[os.write(self._fd, view):]
        if self._tb is not None:
            for k, v in clean.items():
                self._tb.add_scalar(k, v, step)
        if self._wandb is not None:
            self._wandb.log(clean, step=step)

    def close(self):
        os.close(self._fd)
        if self._tb is not None:
            self._tb.close()


class StepTimer:
    """Rolling step-time / throughput tracker."""

    def __init__(self, window: int = 50):
        self.window = window
        self._times: list[float] = []
        self._last = None

    def tick(self) -> float | None:
        now = time.perf_counter()
        dt = None
        if self._last is not None:
            dt = now - self._last
            self._times.append(dt)
            if len(self._times) > self.window:
                self._times.pop(0)
        self._last = now
        return dt

    @property
    def mean_step_time(self) -> float:
        return sum(self._times) / len(self._times) if self._times else 0.0

    def images_per_sec(self, batch: int) -> float:
        t = self.mean_step_time
        return batch / t if t > 0 else 0.0


@contextlib.contextmanager
def trace_ctx(name: str):
    """jax.profiler annotation (visible in TPU profiles)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


def start_profiler_trace(log_dir: str):
    import jax

    jax.profiler.start_trace(log_dir)


def stop_profiler_trace():
    import jax

    jax.profiler.stop_trace()
