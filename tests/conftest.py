"""Test configuration: run on a virtual 8-device CPU mesh by default.

Set GSM_TPU_TESTS=1 to run against the real TPU backend instead.
"""

import os

if not os.environ.get("GSM_TPU_TESTS"):
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    # The environment's device plugin overrides the JAX_PLATFORMS env var at
    # interpreter startup; the config knob is the reliable way to pin CPU.
    import jax
    jax.config.update("jax_platforms", "cpu")
    assert jax.default_backend() == "cpu", (
        "tests must run on CPU; got " + jax.default_backend())

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
