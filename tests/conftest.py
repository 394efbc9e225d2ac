"""Test configuration: force JAX onto CPU with 8 virtual devices so
multi-chip sharding paths are exercised without TPU hardware
(SURVEY.md §4 item 4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override env (may be 'axon' = TPU)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(12345)
