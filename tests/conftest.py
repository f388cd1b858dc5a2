"""Test harness: run on an 8-device virtual CPU mesh.

The reference has no test suite (SURVEY.md section 4); we stand one up.
Multi-device behavior is exercised via XLA's host-platform device-count
flag, the standard JAX substitute for real multi-chip hardware in CI.

Note: the TPU plugin in this environment ignores the JAX_PLATFORMS env var,
so the platform is forced via jax.config before any backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# IISAN_TEST_PLATFORM=tpu runs the suite against the real chip (used to
# exercise the TPU-only Pallas kernel tests); default is the CPU mesh.
if os.environ.get("IISAN_TEST_PLATFORM", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: the 8-device CPU mesh recompiles every jitted
# program per test session otherwise (VERDICT r1 weak #5).
from iisan_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
