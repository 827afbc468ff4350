"""Test configuration: run on a virtual 8-device CPU mesh by default.

Set GSM_TPU_TESTS=1 to run against the real TPU backend instead.
"""

import os

if not os.environ.get("GSM_TPU_TESTS"):
    # The environment's device plugin overrides the JAX_PLATFORMS env var at
    # interpreter startup; the config knob is the reliable way to pin CPU.
    #
    # NOTE: tests run on a single CPU device.  With
    # --xla_force_host_platform_device_count=8, XLA:CPU's executable cache
    # collides across programs of different shapes ("Execution supplied 8
    # buffers but compiled program expected 9").  The 8-device mesh path is
    # exercised by tests/test_multichip.py in a subprocess instead.
    import jax
    jax.config.update("jax_platforms", "cpu")
    assert jax.default_backend() == "cpu", (
        "tests must run on CPU; got " + jax.default_backend())

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


@pytest.fixture(autouse=True)
def _clear_jax_caches_per_test():
    """Work around an XLA:CPU executable-cache collision (jax 0.9.0): once many
    programs have been compiled in one process, dispatching a new program can
    bind a stale executable ("Execution supplied 8 buffers but compiled program
    expected 9").  Clearing the cache between tests avoids the collision at the
    cost of recompiles."""
    yield
    import jax
    jax.clear_caches()
