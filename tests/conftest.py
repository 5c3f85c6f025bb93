"""Test configuration: force CPU with an 8-device virtual mesh so sharding
tests exercise real multi-device paths without TPU hardware (the bench and
the driver's dryrun run on the real chip / their own env).

Note: the axon TPU plugin in this image force-sets ``jax_platforms`` at
interpreter start, so the env var alone is not enough — we must override via
jax.config after import.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
