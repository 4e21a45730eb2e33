"""Test configuration.

Tests run on CPU with 8 virtual devices (multi-chip sharding tests) and
float64 enabled (numerical conformance against float64 oracles).  The env
setup must happen before the first JAX backend initialisation.
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from atlite_tpu import Cutout  # noqa: E402

TIME = "2013-01-01"
BOUNDS = (-4, 56, 1.5, 62)  # reference test workload (test/conftest.py:14-15)


@pytest.fixture(scope="session")
def cutout():
    """Prepared synthetic cutout, float64, one day at 0.25 deg."""
    c = Cutout(
        path=None, module="synthetic", bounds=BOUNDS, time=TIME, dtype="float64"
    )
    c.prepare()
    return c


@pytest.fixture(scope="session")
def cutout_coarse():
    c = Cutout(
        path=None, module="synthetic", bounds=BOUNDS, time=TIME,
        dx=0.5, dy=0.7, dtype="float64",
    )
    c.prepare()
    return c


@pytest.fixture(scope="session")
def cutout_week():
    """A week of data for temporal-aggregation paths."""
    c = Cutout(
        path=None, module="synthetic", bounds=BOUNDS,
        time=slice("2013-01-01", "2013-01-07"), dtype="float64",
    )
    c.prepare()
    return c
