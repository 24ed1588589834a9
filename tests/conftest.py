"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must run before jax initializes its backends, so this lives at the top of
conftest (pytest imports it before any test module).  Note the launch
environment pins JAX_PLATFORMS=axon (the real TPU tunnel); tests always run
on host CPU with 8 virtual devices so mesh/pjit code paths are exercised
without chips.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
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
    return np.random.default_rng(0)


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu():
    assert jax.devices()[0].platform == "cpu", jax.devices()
