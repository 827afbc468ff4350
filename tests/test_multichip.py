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


ADVERSARIAL_SCRIPT = r"""
import os
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
    " --xla_force_host_platform_device_count=8"
import sys
sys.path.insert(0, %(repo)r)
import jax
jax.config.update("jax_platforms", "cpu")
assert len(jax.devices()) == 8
import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh
import gsm_renderer_tpu as G
from gsm_renderer_tpu.io.scene import generate_visible_gaussians
from gsm_renderer_tpu.parallel.multichip import (
    build_sharded_depth_first, shard_gaussian_input)
from gsm_renderer_tpu.pipelines.depth_first import depth_first_frame

mesh = Mesh(np.array(jax.devices()), ("dp",))
w, h = 128, 128

# --- 1: gaussian count NOT divisible by the device count ---------------------
n = 2003
ds = generate_visible_gaussians(n, sh_degree=1, scale_range=(0.12, 0.28))
# --- 2: pathological one-band distribution: squash everything into a thin
# horizontal strip so ONE device's band holds every instance ------------------
ds.positions[:, 1] = 0.04 * (ds.positions[:, 1] / 1.5) + 0.55
cam = G.make_camera(w, h, far=20.0)
view, proj, center = cam.astuple_jax()

gi = shard_gaussian_input(ds.to_input(), mesh)
assert gi.positions.shape[0] %% 8 == 0  # padded
# one-band pathology: the hot band holds ~every instance, so give each
# band the full mono capacity
render = build_sharded_depth_first(mesh, width=w, height=h, n_total=n,
                                   sh_degree=1, near_plane=0.1, far_plane=20.0,
                                   capacity_per_device=16 * n)
color, depth, overflow = render(gi, view, proj, center)
color = np.asarray(color)
assert color.shape == (h, w, 4)
assert np.isfinite(color).all()
assert int(np.asarray(overflow)) == 0

# mono oracle: the sharded frame must match a single-device render
import functools
mono = functools.partial(
    depth_first_frame, width=w, height=h,
    capacity=-(-16 * n // 4096) * 4096, sh_degree=1, alpha_threshold=0.005,
    total_ink_threshold=2.0, near_plane=0.1, far_plane=20.0,
    input_is_srgb=False, use_xla_blend=True)
out = jax.jit(mono)(ds.to_input(), view, proj, center)
mono_color = np.asarray(out.color)
diff = np.abs(color - mono_color).max()
assert diff < 2e-4, f"sharded vs mono diff {diff}"

# --- 3: hot band must REPORT overflow when its capacity is exceeded ----------
render_tiny = build_sharded_depth_first(mesh, width=w, height=h, n_total=n,
                                        sh_degree=1, near_plane=0.1,
                                        far_plane=20.0,
                                        capacity_per_device=2048)
_c, _d, ovf = render_tiny(gi, view, proj, center)
assert int(np.asarray(ovf)) == 1, "hot band overflow not reported"
print("ADVERSARIAL_OK diff=%%.2e" %% diff)
"""


def test_multichip_adversarial_one_band_and_ragged_count():
    """n %% D != 0 (auto-padded), all instances in one device's band (matches
    the mono oracle), and per-band overflow propagates to the caller."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    proc = subprocess.run(
        [sys.executable, "-c", ADVERSARIAL_SCRIPT % {"repo": REPO}],
        capture_output=True, text=True, timeout=900, env=env)
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "ADVERSARIAL_OK" in proc.stdout, proc.stdout
