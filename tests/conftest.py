"""Test harness: run everything on a virtual 8-device CPU mesh.

The axon TPU plugin in this image overrides the JAX_PLATFORMS env var, so
the CPU backend must be forced through jax.config before any computation.
Mirrors the reference's absence of GPU requirements for math tests and lets
multi-chip sharding tests run anywhere (SURVEY.md §4 item 4).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu_mesh():
    assert jax.devices()[0].platform == "cpu"
    assert len(jax.devices()) == 8
