"""Test bootstrap: force a virtual 8-device CPU mesh.

This environment's sitecustomize (axon TPU tunnel) imports jax at
interpreter startup, locking the platform and XLA_FLAGS before conftest
runs — so in-process env edits are too late.  We re-exec the test process
once with the right environment (the reference's functional-simulator
analogue: SURVEY.md §4 — multi-device tests without hardware).
"""

import os
import sys

_GUARD = "_AIM_TPU_TEST_REEXEC"

if os.environ.get(_GUARD) != "1":
    env = dict(os.environ)
    env[_GUARD] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_PLATFORM_NAME"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    # Re-exec via -m so cwd stays on sys.path; belt-and-braces PYTHONPATH.
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    os.execve(sys.executable,
              [sys.executable, "-m", "pytest"] + sys.argv[1:], env)

# Persistent compilation cache: first run pays the (single-core) XLA
# compile, reruns are seconds.
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: full-dataset equality sweeps (pytest -m slow)")


def pytest_collection_modifyitems(config, items):
    # slow tests run only when explicitly selected (pytest -m slow)
    if config.getoption("-m"):
        return
    import pytest
    skip = pytest.mark.skip(reason="slow: run with -m slow")
    for it in items:
        if "slow" in it.keywords:
            it.add_marker(skip)
