"""Checkpoint / resume via orbax (SURVEY.md §5.4).

The full ``TrainState`` pytree (G/D params, EMA, both optimizer states, ADA
p + sign stats, path-length running mean, step, rng) plus the config are
saved every ``--ckpt_every`` steps; resume restores everything — including
``ada_p``, which the reference saves but forgets to restore (train.py bug
ledger, SURVEY.md §8)."""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

from stylerenderer_tpu.utils.config import TrainConfig


def _manager(ckpt_dir: str, max_to_keep: int = 5) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(ckpt_dir),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
    )


def save_checkpoint(ckpt_dir: str, step: int, state, cfg: TrainConfig,
                    max_to_keep: int = 5):
    mgr = _manager(ckpt_dir, max_to_keep)
    mgr.save(
        step,
        args=ocp.args.Composite(
            state=ocp.args.StandardSave(state),
            config=ocp.args.JsonSave(cfg.to_dict()),
        ),
    )
    mgr.wait_until_finished()
    mgr.close()


def latest_step(ckpt_dir: str) -> int | None:
    if not os.path.isdir(ckpt_dir):
        return None
    mgr = _manager(ckpt_dir)
    step = mgr.latest_step()
    mgr.close()
    return step


def load_checkpoint(ckpt_dir: str, state_template, step: int | None = None):
    """-> (state, TrainConfig). ``state_template`` provides the pytree
    structure/shapes (build it with init_train_state)."""
    mgr = _manager(ckpt_dir)
    if step is None:
        step = mgr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
    restored = mgr.restore(
        step,
        args=ocp.args.Composite(
            state=ocp.args.StandardRestore(state_template),
            config=ocp.args.JsonRestore(),
        ),
    )
    mgr.close()
    return restored["state"], TrainConfig.from_dict(restored["config"])


def load_params_only(ckpt_dir: str, step: int | None = None) -> dict[str, Any]:
    """Restore the raw state dict without a template (for eval/generate:
    pull ``g_ema`` / ``g_params`` out of any checkpoint)."""
    mgr = _manager(ckpt_dir)
    if step is None:
        step = mgr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
    restored = mgr.restore(
        step,
        args=ocp.args.Composite(
            state=ocp.args.StandardRestore(),
            config=ocp.args.JsonRestore(),
        ),
    )
    mgr.close()
    return dict(restored["state"]), TrainConfig.from_dict(restored["config"])
