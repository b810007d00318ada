"""Test harness configuration.

Tests run on CPU with 8 virtual devices (so multi-chip sharding paths compile
and execute without TPU hardware) and with x64 enabled (the ILT parity tests
need f64; reference trains in double, train_utils.py:267). f32 behaviour is
still covered by constructing explicit f32 arrays.
"""

import os

# Must be set before the first jax import in the process.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
