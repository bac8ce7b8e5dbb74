"""Test configuration.

Tests run on CPU with 8 virtual devices so that (a) the suite is fast and
deterministic (the sandbox TPU has ~3.5 ms fixed cost per dispatch and a
single chip), and (b) multi-chip sharding paths can be exercised on a
virtual jax.sharding.Mesh, as the driver's dryrun does.

NOTE: on this sandbox the axon TPU plugin ignores JAX_PLATFORMS; the
jax.config.update call below is what actually forces CPU, and it must run
before any jax device is created.
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
if "device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
