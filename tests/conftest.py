"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware isn't available in CI; sharding correctness is
validated on XLA's host-platform virtual devices instead (same SPMD
partitioner, same collectives).

NOTE: this environment preloads jax via sitecustomize, so JAX_PLATFORMS env
changes are too late - the platform must be forced through jax.config before
any backend initializes.
"""

import os

# XLA reads XLA_FLAGS at backend init (not jax import) - still effective here.
if "--xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    )
# The CPU collective rendezvous hard-aborts the process after 40 s; on this
# starved host the 8-virtual-device all-reduce threads can miss that under
# load. Raise it well past any realistic stall.
if "--xla_cpu_collective_timeout_seconds" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] += " --xla_cpu_collective_timeout_seconds=600"
# Persistent compile cache: XLA compilation dominates test wall-time on CPU.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax  # noqa: E402

# PPG_TEST_PLATFORM=tpu leaves the default (axon TPU) backend in place so the
# TPU-gated regression tests (tests/test_tpu_bf16.py) can run on the chip:
#   PPG_TEST_PLATFORM=tpu python -m pytest tests/test_tpu_bf16.py -q
# Everything else (and CI) runs on the CPU backend with 8 virtual devices.
_PLATFORM = os.environ.get("PPG_TEST_PLATFORM", "cpu")
if _PLATFORM == "cpu":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def pytest_sessionstart(session):
    if _PLATFORM == "cpu":
        assert jax.default_backend() == "cpu", "tests must run on the CPU backend"
