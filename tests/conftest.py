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

# XLA:CPU prints a full-page LOG(ERROR) on every persistent-cache load whose
# embedded feature list includes XLA-internal pseudo-features (+prefer-no-*)
# absent from the host probe; the entry still loads (measured 12.9s -> 3.4s
# compile) so the message is pure noise that buries real test output.
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

import sys

sys.path.insert(0, _repo)

# Per-machine XLA:CPU compile cache (dcgan_sr_tpu/utils/cache.py): entries
# from another host fail XLA's CPU-feature check and force full recompiles,
# so a shared cache dir is slower than none. Set the env var too so CPU
# subprocess tests (CLI/tools --cpu) inherit the same cache.
from dcgan_sr_tpu.utils.cache import machine_cpu_cache_dir  # noqa: E402

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", machine_cpu_cache_dir())
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

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
