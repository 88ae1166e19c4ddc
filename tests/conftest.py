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

# Persistent XLA compilation cache (VERDICT r3 #2): the suite is dominated
# by minutes-long CPU compiles of the cooperative steps; warm runs skip
# them entirely. Repo-local dir (gitignored) shared across pytest runs.
# Best-effort — a backend without executable serialization just recompiles.
_CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".pytest_jax_cache")
try:
    os.makedirs(_CACHE_DIR, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:
    pass


@pytest.fixture
def rng():
    return np.random.RandomState(0)
