"""Test configuration: force JAX onto CPU with 8 virtual devices so
multi-chip sharding paths are exercised without TPU hardware
(SURVEY.md §4 item 4).

Note: this environment's sitecustomize registers an 'axon' TPU PJRT
plugin and overwrites jax_platforms at import time, so env vars alone
don't stick — the config must be reset after importing jax and before
first device use.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(12345)
