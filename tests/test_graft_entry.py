"""Driver-entry contract tests.

Round-1 regression: ``dryrun_multichip`` asserted 8 devices instead of
creating them, so the driver (which calls it in a FRESH interpreter pinned to
the 1-device axon platform by sitecustomize) recorded ok=false. These tests
invoke the entry exactly the way the driver does — a clean subprocess with the
ambient environment, no conftest help — so that failure mode can't recur.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_clean_interpreter():
    # the driver's exact call: fresh interpreter, ambient env (which on this
    # image pins JAX_PLATFORMS=axon via sitecustomize), no XLA_FLAGS
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    r = subprocess.run(
        [
            sys.executable,
            "-c",
            "from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)",
        ],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=540,
    )
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"
    assert "dryrun_multichip(8) OK" in r.stdout, r.stdout


def test_dryrun_multichip_reexecs_when_backend_initialized():
    # if the calling interpreter already initialized a (wrong-platform)
    # backend, the entry must fall back to a clean-env subprocess
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "jax.devices()  # initialize the backend with 1 CPU device\n"
        "from __graft_entry__ import dryrun_multichip\n"
        "dryrun_multichip(8)\n"
        "print('OUTER-OK')\n"
    )
    r = subprocess.run(
        [sys.executable, "-c", code],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=540,
    )
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"
    assert "OUTER-OK" in r.stdout, r.stdout
