"""Test configuration: run on a virtual 8-device CPU mesh by default.

Set GSM_TPU_TESTS=1 to run against the real TPU backend instead.
"""

import os

if not os.environ.get("GSM_TPU_TESTS"):
    # Force, don't setdefault: the environment may pre-set JAX_PLATFORMS to a TPU
    # platform, and CPU tests must not silently run over the device tunnel.
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
