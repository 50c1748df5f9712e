"""Test harness: force CPU with 8 virtual devices so multi-chip sharding logic
is exercised without TPU hardware (SURVEY §4 implication (c)).

Note: the axon sitecustomize registers the TPU backend in every interpreter and
overrides JAX_PLATFORMS from the environment, so the CPU override must go
through jax.config after import (verified: env-var alone is ignored)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=8"
# One physical core timeshares the 8 virtual device programs, so slow arrivals
# at a collective rendezvous can exceed XLA's 40s termination timeout and
# SIGABRT the process. Raise the timeouts (observed: a micro-model train step
# needs ~300s wall on this box).
if "collective_call_terminate" not in flags:
    flags += (" --xla_cpu_collective_call_terminate_timeout_seconds=1200"
              " --xla_cpu_collective_call_warn_stuck_timeout_seconds=600")
os.environ["XLA_FLAGS"] = flags.strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def demo_video():
    path = "/root/reference/experiments/video0.mp4"
    if not os.path.exists(path):
        pytest.skip("demo video not available")
    return path
