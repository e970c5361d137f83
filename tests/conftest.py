"""Tests run on a virtual 8-device CPU mesh so DP/psum paths execute without
real TPUs (SURVEY.md §4: multi-chip tests via host-platform device count).

NOTE: the axon TPU plugin force-prepends itself to JAX_PLATFORMS at import
time, so env vars alone don't pin the platform — we must override the jax
config after import (before any backend initialization).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _cpu_cache_dir():
    """Per-machine XLA:CPU compile cache.

    XLA:CPU AOT results embed the compile machine's CPU features; loading an
    entry produced on a different host falls back to a FULL recompile (after
    paying the failed-load cost) — a poisoned shared cache made the suite
    slower than no cache at all. Key the directory by the host's CPU flags so
    each machine warms its own cache. (.jax_cache stays for TPU programs,
    whose entries are keyed by the TPU target, not the host.)
    """
    import hashlib
    try:
        with open("/proc/cpuinfo") as f:
            flags = next((l for l in f if l.startswith("flags")), "")
    except OSError:
        flags = ""
    import platform
    tag = hashlib.sha1((platform.machine() + flags).encode()).hexdigest()[:10]
    return os.path.join(_repo, ".jax_cache_cpu_" + tag)


os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _cpu_cache_dir())
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import sys

sys.path.insert(0, _repo)

import jax

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu"
# The env vars above are read by jax at import time; if any pytest plugin
# imported jax before this conftest ran they were lost — set explicitly
# (the persistent cache otherwise stays "disabled/not initialized" and every
# CPU-mesh train-step test recompiles from scratch, ~9 min suite).
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import pytest


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="also run tests marked slow (subprocess CLI flows, torch "
             "train-step parity) — the full round-1 suite")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running subprocess/e2e test (needs --runslow)")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow tier: pass --runslow to include")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
