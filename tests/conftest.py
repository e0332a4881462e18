"""Test config: run everything on a virtual 8-device CPU mesh.

Must set XLA flags before jax initializes, so this executes at conftest
import time (pytest loads conftest before any test module).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# Persistent compilation cache: XLA compiles are expensive on this host;
# cache them across test runs.
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
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
