"""Failure detection & recovery (SURVEY.md §5.3 — the reference has none:
a crash means restarting from the last 10k-step checkpoint by hand).

- ``metrics_finite``: cheap host-side NaN/Inf screen on the step metrics;
- ``state_finite``: full pytree scan (one device reduction per leaf tree);
- ``TrainGuard``: wraps the training loop's step results — counts
  consecutive non-finite steps, triggers a restore callback after a
  threshold, and raises if recovery keeps failing (fail-fast beats silently
  training on NaNs).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def metrics_finite(metrics: dict) -> bool:
    for v in metrics.values():
        x = float(v)
        if not np.isfinite(x):
            return False
    return True


def state_finite(tree) -> bool:
    leaves = jax.tree_util.tree_leaves(tree)
    flags = [
        jnp.all(jnp.isfinite(l)) for l in leaves
        if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.floating)
    ]
    if not flags:
        return True
    return bool(jax.device_get(jnp.all(jnp.stack(flags))))


class TrainGuard:
    """Detects non-finite training steps and drives recovery.

    guard = TrainGuard(restore_fn, max_bad_steps=3, max_restores=5)
    state = guard.check(step_idx, state, metrics, prev_state)
    """

    def __init__(self, restore_fn: Callable | None = None,
                 max_bad_steps: int = 3, max_restores: int = 5):
        self.restore_fn = restore_fn
        self.max_bad_steps = max_bad_steps
        self.max_restores = max_restores
        self.bad_streak = 0
        self.restores = 0
        self.bad_total = 0

    def check(self, step: int, state, metrics: dict, prev_state):
        """Returns the state to continue from (``prev_state`` if this step
        must be discarded). Raises RuntimeError when recovery is exhausted."""
        if metrics_finite(metrics):
            self.bad_streak = 0
            return state
        self.bad_streak += 1
        self.bad_total += 1
        if self.bad_streak < self.max_bad_steps:
            # drop this step, retry from the previous state
            return prev_state
        # persistent failure: restore from checkpoint
        self.restores += 1
        self.bad_streak = 0
        if self.restores > self.max_restores:
            raise RuntimeError(
                f"training diverged at step {step}: {self.bad_total} non-finite "
                f"steps, {self.restores - 1} checkpoint restores exhausted"
            )
        if self.restore_fn is None:
            raise RuntimeError(
                f"training produced non-finite metrics at step {step} and no "
                "restore_fn is configured"
            )
        return self.restore_fn()
