"""Test config: run on a virtual 8-device CPU mesh (SURVEY.md §4).

The environment ships JAX_PLATFORMS=axon (one real TPU chip) and a
sitecustomize that imports jax at interpreter startup, so env vars set here
are too late; jax.config.update still works because backend initialization
is lazy. XLA_FLAGS is also read lazily at first backend init.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.default_backend() == "cpu", "tests must run on the CPU backend"
assert jax.device_count() == 8, "tests expect 8 virtual CPU devices"


@pytest.fixture
def rng():
    return np.random.RandomState(0)
