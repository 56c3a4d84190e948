"""Test harness: force JAX onto CPU with 8 virtual devices.

This is the standard JAX fake-multi-device harness (the reference never needed
one — it is single-GPU, SURVEY.md §2.8); it lets every sharding test run on any
host while the real TPU path is exercised by bench.py / the driver.

NOTE: this environment pre-registers an ``axon`` TPU PJRT plugin and pins
``JAX_PLATFORMS=axon``, so plain env-var overrides are ignored; we must use
``jax.config.update`` before the first backend use.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="run the @pytest.mark.slow tier (the handful of >45 s "
             "compile-heavy tests; the default tier keeps a full run "
             "under ~8 min)",
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: >45 s compile-heavy test; skipped unless --runslow "
        "(or -m slow) is given",
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow") or config.getoption("-m"):
        return  # explicit marker selection overrides the default skip
    skip = pytest.mark.skip(reason="slow tier: pass --runslow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
