"""Test config: run everything on a virtual 8-device CPU mesh.

Must set XLA flags before jax initializes, so this executes at conftest
import time (pytest loads conftest before any test module).
"""

import os

import jax

# Force the CPU backend with 8 virtual devices (the env-var route is
# overridden by the preinstalled TPU plugin, so use the config API).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# Persistent compilation cache: XLA compiles are expensive on this host;
# cache them across test runs.  Use the repo-shipped cache (.jax_cache/,
# committed) when writable so fresh containers start warm — same dir
# mq3d_tpu/__init__.py selects; keep in sync with it.
_repo_cache = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
jax.config.update(
    "jax_compilation_cache_dir",
    _repo_cache if os.path.isdir(_repo_cache) and os.access(_repo_cache, os.W_OK)
    else "/root/.cache/jax")
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


@pytest.fixture
def cpu_subprocess_env():
    """Env for CLI subprocess tests: force the CPU backend so the test
    never contends for the exclusive single-process TPU tunnel."""
    return {**os.environ, "JAX_PLATFORMS": "cpu", "MQ3D_FORCE_CPU": "1"}


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: production-shape case excluded from the default <5 min gate; "
        "run with MQ3D_FULL_TESTS=1 (or -m slow) for the full tier",
    )


def pytest_collection_modifyitems(config, items):
    """Two-tier suite: `pytest -q` is the fast gate; the slow
    production-shape cases run when MQ3D_FULL_TESTS=1 is set or an explicit
    -m expression selects them."""
    if os.environ.get("MQ3D_FULL_TESTS") or config.getoption("-m"):
        return
    skip_slow = pytest.mark.skip(
        reason="slow tier (set MQ3D_FULL_TESTS=1 or -m slow)")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip_slow)
