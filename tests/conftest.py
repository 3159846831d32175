"""Test environment: force an 8-device CPU JAX backend.

Multi-chip hardware is not available in CI; the standard JAX pattern is to
fake it with host devices (SURVEY.md section 4d).

NOTE: this container's ``sitecustomize.py`` (PYTHONPATH=/root/.axon_site)
imports jax at interpreter startup and pins ``JAX_PLATFORMS=axon`` (the TPU
tunnel), so setting env vars here is too late — ``jax.config.update`` is the
only reliable override.  XLA_FLAGS still works because the CPU client
initializes lazily on first ``jax.devices()``.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu_backend():
    assert jax.default_backend() == "cpu", "tests must run on the CPU backend"
    assert len(jax.devices()) == 8


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
