"""Test harness configuration.

Tests run on CPU with 8 virtual devices (so multi-chip sharding paths compile
and execute without TPU hardware) and with x64 enabled (the ILT parity tests
need f64; reference trains in double, train_utils.py:267). f32 behaviour is
still covered by constructing explicit f32 arrays.
"""

import os

# NLC_TPU_TESTS=1 keeps the real TPU backend so the @tpu-marked tests
# (compiled-mode Pallas accuracy, tests/test_pallas_nl.py) can run on the
# chip:  NLC_TPU_TESTS=1 python -m pytest tests -m tpu
_REAL_TPU = os.environ.get("NLC_TPU_TESTS") == "1"

# Must be set before the first jax import in the process.
if not _REAL_TPU:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    )

import jax  # noqa: E402

if not _REAL_TPU:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    # Persistent XLA compile cache: most of the inner loop's wall-clock is
    # jit compiles of shapes that don't change between runs, so re-runs —
    # the case the inner loop exists for — hit disk instead of recompiling
    # (measured: full fast tier 16 min cold -> ~half warm on this 1-vCPU
    # host; kill the cache dir if compile behaviour itself is under test).
    # NLC_TEST_NO_COMPILE_CACHE=1 opts out (e.g. for timing cold compiles).
    if os.environ.get("NLC_TEST_NO_COMPILE_CACHE") != "1":
        _cache_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".pytest_jit_cache",
        )
        os.makedirs(_cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    """@pytest.mark.tpu tests only run under NLC_TPU_TESTS=1 (real chip);
    everything else is skipped in that mode (the suite assumes CPU+x64)."""
    skip_tpu = pytest.mark.skip(reason="needs NLC_TPU_TESTS=1 and a real TPU")
    skip_cpu = pytest.mark.skip(reason="CPU-suite test skipped in TPU mode")
    for item in items:
        has_tpu = "tpu" in item.keywords
        if has_tpu and not _REAL_TPU:
            item.add_marker(skip_tpu)
        elif not has_tpu and _REAL_TPU:
            item.add_marker(skip_cpu)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
