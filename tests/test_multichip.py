"""Multi-chip sharded rendering test.

Runs in a subprocess with an 8-virtual-device CPU mesh (the flag must be set
before the backend initializes, and the main test process stays single-device —
see conftest.py)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCRIPT = r"""
import os
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
    " --xla_force_host_platform_device_count=8"
import sys
sys.path.insert(0, %(repo)r)
import jax
jax.config.update("jax_platforms", "cpu")
assert len(jax.devices()) == 8, jax.devices()
import importlib.util
spec = importlib.util.spec_from_file_location(
    "graft", %(repo)r + "/__graft_entry__.py")
m = importlib.util.module_from_spec(spec)
spec.loader.exec_module(m)
m.dryrun_multichip(8)
m.dryrun_multichip(4)
print("MULTICHIP_OK")
"""


def test_dryrun_multichip_8_devices():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT % {"repo": REPO}],
        capture_output=True, text=True, timeout=900, env=env)
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "MULTICHIP_OK" in proc.stdout, proc.stdout
