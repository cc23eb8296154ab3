"""Tests run on CPU with 8 virtual devices so multi-chip sharding is
exercised without TPU hardware.

This environment registers an out-of-tree TPU PJRT plugin through
sitecustomize and pins jax_platforms to it via config (which outranks
the JAX_PLATFORMS env var), so we must force CPU through jax.config
*before any backend initializes* — hence this happens at conftest
import time, ahead of every test module.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rs():
    return np.random.RandomState(1234)
