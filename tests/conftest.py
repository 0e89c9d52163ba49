"""Test harness configuration.

Runs the whole suite on a *virtual 8-device CPU mesh* — the idiomatic JAX way
to exercise multi-chip sharding without TPU hardware (SURVEY.md §4c). Must set
the env vars before jax initializes its backends.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The TPU-tunnel plugin (sitecustomize) force-registers itself and rewrites
# jax_platforms to "axon,cpu" — override *after* import so tests really run on
# the virtual 8-device CPU mesh, not through the device tunnel.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def pytest_addoption(parser):
    parser.addoption("--runslow", action="store_true", default=False,
                     help="run slow (flagship-size) tests")


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: flagship-size test, minutes on CPU")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow") or os.environ.get("RUN_SLOW"):
        return
    skip = pytest.mark.skip(reason="slow: pass --runslow (or RUN_SLOW=1)")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
