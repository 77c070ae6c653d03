"""Test harness: run on CPU with 8 virtual devices so sharding/SPMD paths are
exercised without TPU hardware (bench.py runs on the real chip instead).

Note: this image's sitecustomize imports jax at interpreter start (axon TPU
plugin), so env vars are captured before conftest runs — we must override via
jax.config, which takes effect at (lazy) backend initialization.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    return jax.devices()
