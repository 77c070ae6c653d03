import numpy as np
import pytest
import jax.numpy as jnp

from stylerenderer_tpu.utils.guards import TrainGuard, metrics_finite, state_finite


def test_metrics_finite():
    assert metrics_finite({"a": 1.0, "b": jnp.asarray(2.0)})
    assert not metrics_finite({"a": float("nan")})
    assert not metrics_finite({"a": 1.0, "b": float("inf")})


def test_state_finite():
    assert state_finite({"w": jnp.ones(3), "step": jnp.asarray(1)})
    assert not state_finite({"w": jnp.asarray([1.0, float("nan")])})


def test_guard_drops_bad_step_then_restores():
    restored = []

    def restore():
        restored.append(True)
        return "ckpt_state"

    g = TrainGuard(restore_fn=restore, max_bad_steps=2, max_restores=2)
    # one bad step -> retry from prev
    out = g.check(0, "new", {"l": float("nan")}, "prev")
    assert out == "prev" and not restored
    # second consecutive bad step -> restore
    out = g.check(1, "new", {"l": float("nan")}, "prev")
    assert out == "ckpt_state" and len(restored) == 1
    # good step resets
    out = g.check(2, "new", {"l": 1.0}, "prev")
    assert out == "new"


def test_guard_exhausts():
    g = TrainGuard(restore_fn=lambda: "s", max_bad_steps=1, max_restores=1)
    g.check(0, "n", {"l": float("nan")}, "p")  # restore 1
    with pytest.raises(RuntimeError):
        g.check(1, "n", {"l": float("nan")}, "p")
