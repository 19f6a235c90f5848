"""Test configuration: run the suite on an 8-device virtual CPU mesh.

Multi-chip sharding paths are exercised without TPU hardware by forcing the
host platform and splitting it into 8 XLA devices (SURVEY.md §4 testing
strategy). The container pins JAX_PLATFORMS=axon (remote TPU tunnel) via
sitecustomize, and jax may already be imported by the time pytest starts —
so override through jax.config, which takes effect until the first backend
use, rather than env vars alone.
"""
import os
import resource

# XLA-CPU's LLVM backend recurses deeply when emitting the biggest fused
# programs in this suite (hand-env rollouts, the mppiq-with-Q closed-loop
# kernel in interpreter mode); on the default 8 MB main-thread stack that
# segfaults the whole pytest process partway through a single-process
# full-suite run (observed 3x in r5, always inside backend_compile).
# Raising the soft limit to the hard limit lets the main stack grow past
# it — the compile then completes (slowly) instead of crashing.
_soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
if _soft != resource.RLIM_INFINITY and (_hard == resource.RLIM_INFINITY or _soft < _hard):
    resource.setrlimit(resource.RLIMIT_STACK, (_hard, _hard))

os.environ["JAX_PLATFORMS"] = "cpu"  # for any subprocesses we spawn
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(42)
