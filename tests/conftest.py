"""Test configuration: force an 8-device virtual CPU mesh.

All unit tests run CPU-only, no weights, no network — the reference's test
strategy (SURVEY.md §4) — plus what it lacks: a fake multi-device mesh so
TP/DP logic is testable without a TPU slice.

This must run before any test touches a JAX backend: the environment's
sitecustomize registers the axon TPU plugin and pins jax_platforms, so we
re-pin to CPU here and request 8 virtual host devices.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    devs = jax.devices()
    assert len(devs) == 8, devs
    return devs


@pytest.fixture(scope="session")
def mesh8(devices):
    from jax.sharding import AxisType

    return jax.make_mesh(
        (2, 4), ("dp", "tp"), axis_types=(AxisType.Auto, AxisType.Auto)
    )
