"""Test config: run everything on a virtual 8-device CPU mesh.

Must set XLA flags before jax initializes, so this executes at conftest
import time (pytest loads conftest before any test module).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# Persistent compilation cache: XLA compiles are expensive on this host;
# cache them across test runs.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
