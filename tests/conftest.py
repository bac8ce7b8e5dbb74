"""Test configuration.

By default tests run on CPU with 8 virtual devices so that (a) the suite
is fast and deterministic (the sandbox TPU has ~28 ms fixed cost per host
sync and a single chip), and (b) multi-chip sharding paths can be
exercised on a virtual jax.sharding.Mesh, as the driver's dryrun does.
In CPU mode every Pallas kernel runs in interpreter mode.

RUN_TPU=1 switches to the ON-TPU tier: the suite keeps the real TPU
backend, tests marked ``tpu_only`` (tests/test_on_tpu.py — real Mosaic
lowering of every Pallas kernel vs its XLA twin, plus a VGA tracking
clip with an ATE bound) become runnable, and tests that REQUIRE the
8-device CPU mesh auto-skip. Protocol:

    RUN_TPU=1 python -m pytest tests/test_on_tpu.py -v

NOTE: on this sandbox the axon TPU plugin ignores JAX_PLATFORMS; the
jax.config.update call below is what actually forces CPU, and it must run
before any jax device is created.
"""

import os

RUN_TPU = os.environ.get("RUN_TPU", "") == "1"

if not RUN_TPU:
    os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    if "device_count" not in os.environ.get("XLA_FLAGS", ""):
        os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax

if not RUN_TPU:
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


def pytest_collection_modifyitems(config, items):
    skip_cpu_mesh = pytest.mark.skip(
        reason="needs the 8-virtual-device CPU mesh (unset RUN_TPU)"
    )
    skip_tpu = pytest.mark.skip(reason="on-TPU tier: set RUN_TPU=1")
    for item in items:
        if RUN_TPU and "cpu_mesh" in item.keywords:
            item.add_marker(skip_cpu_mesh)
        if not RUN_TPU and "tpu_only" in item.keywords:
            item.add_marker(skip_tpu)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "tpu_only: runs only in the RUN_TPU=1 tier (real chip)"
    )
    config.addinivalue_line(
        "markers", "cpu_mesh: requires the 8-virtual-device CPU mesh"
    )


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
