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


# ---------------------------------------------------------------------
# slow-test gating (VERDICT r3 #10): the multi-minute e2e/multiprocess/
# device-parity tests carry @pytest.mark.slow and are SKIPPED by
# default so the iteration loop stays fast. Run everything with
#
#     python -m pytest tests/ --runslow            (full battery)
#     python -m pytest tests/ -n auto --runslow    (parallel, fastest)
#
# CI/driver runs of the default path stay green either way.
# ---------------------------------------------------------------------

def pytest_addoption(parser):
    parser.addoption("--runslow", action="store_true", default=False,
                     help="also run tests marked slow")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: multi-minute e2e/parity test (needs --runslow)")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow test: use --runslow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
