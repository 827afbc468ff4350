"""Multi-chip sharded rendering test.

Runs in a subprocess with an 8-virtual-device CPU mesh (the flag must be set
before the backend initializes, and the main test process stays single-device —
see conftest.py)."""

import os
import pytest
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


BALANCE_SCRIPT = r"""
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
    build_sharded_depth_first, shard_gaussian_input,
    row_instance_histogram, balance_band_starts)
from gsm_renderer_tpu.pipelines.depth_first import depth_first_frame

mesh = Mesh(np.array(jax.devices()), ("dp",))
w, h = 128, 256   # 16 tile rows over 8 devices: bands can actually move
n = 2003
ds = generate_visible_gaussians(n, sh_degree=1, scale_range=(0.12, 0.28))
# hot-strip scene: ~every instance lands in one equal-split band
ds.positions[:, 1] = 0.04 * (ds.positions[:, 1] / 1.5) + 0.55
cam = G.make_camera(w, h, far=20.0)
view, proj, center = cam.astuple_jax()
gi_mono = ds.to_input()
gi = shard_gaussian_input(gi_mono, mesh)

hist = row_instance_histogram(gi_mono, view, proj, center, width=w, height=h,
                              sh_degree=1, near_plane=0.1, far_plane=20.0)
assert hist.sum() > 0
starts = balance_band_starts(hist, 8)
assert len(starts) == 9 and starts[0] == 0 and starts[-1] == 16
assert all(b1 > b0 for b0, b1 in zip(starts, starts[1:])), starts

# equal-band max load vs balanced max load (the point of the exercise)
def band_loads(bs):
    return [int(hist[b0:b1].sum()) for b0, b1 in zip(bs, bs[1:])]
eq = band_loads(tuple(range(0, 17, 2)))
bal = band_loads(starts)
assert max(bal) < max(eq), (eq, bal)

# a capacity that the hot equal-split band overflows must FIT with balanced
# bands (each gaussian still owns >= 1 slot per device => >= padded-n slots,
# so cap must cover n + max balanced band load; the equal split's
# hot band carries ~18.7k + n and must overflow it)
cap = 16384
render_eq = build_sharded_depth_first(mesh, width=w, height=h, n_total=n,
                                      sh_degree=1, near_plane=0.1,
                                      far_plane=20.0, capacity_per_device=cap)
_c, _d, ovf_eq = render_eq(gi, view, proj, center)
render_bal = build_sharded_depth_first(mesh, width=w, height=h, n_total=n,
                                       sh_degree=1, near_plane=0.1,
                                       far_plane=20.0, capacity_per_device=cap,
                                       band_starts=starts)
color, depth, ovf_bal = render_bal(gi, view, proj, center)
assert int(np.asarray(ovf_eq)) == 1, "equal split should overflow at cap"
assert int(np.asarray(ovf_bal)) == 0, "balanced bands should fit at cap"

# balanced-band output must still match the mono oracle
import functools
mono = functools.partial(
    depth_first_frame, width=w, height=h,
    capacity=-(-48 * n // 4096) * 4096,  # ~65k instances at this h: the
    sh_degree=1, alpha_threshold=0.005,  # oracle itself must not overflow
    total_ink_threshold=2.0, near_plane=0.1, far_plane=20.0,
    input_is_srgb=False, use_xla_blend=True)
out = jax.jit(mono)(gi_mono, view, proj, center)
assert int(out.header.overflow) == 0
diff = np.abs(np.asarray(color) - np.asarray(out.color)).max()
assert diff < 2e-4, f"balanced sharded vs mono diff {diff}"
print("BALANCE_OK diff=%%.2e loads eq=%%s bal=%%s" %% (diff, eq, bal))
"""


PRODUCTION_SCRIPT = r"""
import os
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
    " --xla_force_host_platform_device_count=8"
import sys
sys.path.insert(0, %(repo)r)
import jax
jax.config.update("jax_platforms", "cpu")
assert len(jax.devices()) == 8
import numpy as np
from jax.sharding import Mesh
import gsm_renderer_tpu as G
from gsm_renderer_tpu.io.scene import generate_visible_gaussians
from gsm_renderer_tpu.parallel.multichip import (
    build_sharded_depth_first, shard_gaussian_input)

mesh = Mesh(np.array(jax.devices()), ("dp",))
w, h = 128, 128
n = 1201
ds = generate_visible_gaussians(n, sh_degree=1, scale_range=(0.10, 0.25))
cam = G.make_camera(w, h, far=20.0)
view, proj, center = cam.astuple_jax()
gi = shard_gaussian_input(ds.to_input(), mesh)
common = dict(width=w, height=h, n_total=n, sh_degree=1, near_plane=0.1,
              far_plane=20.0, capacity_per_device=8 * n)

# fused single-program sharded frame (KeyPlan unstable sort, the default)
render_fused = build_sharded_depth_first(mesh, **common)
c0, d0, ovf0 = (np.asarray(x) for x in render_fused(gi, view, proj, center))
assert ovf0 == 0

# 3-program production split (pre | bare per-band sort | post) must be
# bitwise identical — same computations, different program boundaries
render_split = build_sharded_depth_first(mesh, split_frame=True, **common)
c1, d1, _ = (np.asarray(x) for x in render_split(gi, view, proj, center))
assert np.array_equal(c0, c1), np.abs(c0 - c1).max()
assert np.array_equal(d0, d1)

# stable-sort fallback (use_keyplan=False) must render the same frame: the
# tie-free keys reproduce the stable tie order exactly
render_stable = build_sharded_depth_first(mesh, use_keyplan=False, **common)
c2, _, _ = (np.asarray(x) for x in render_stable(gi, view, proj, center))
assert np.array_equal(c0, c2), np.abs(c0 - c2).max()

# fused Pallas projection kernel (interpret mode on CPU), the mono
# production projection running per shard: visible-row bitexact on chip,
# tight parity in interpret mode
render_pp = build_sharded_depth_first(mesh, pallas_project=True,
                                      interpret=True, **common)
c3, _, _ = (np.asarray(x) for x in render_pp(gi, view, proj, center))
diff = np.abs(c0 - c3).max()
assert diff < 2e-4, f"pallas-project sharded diff {diff}"
print("PRODUCTION_OK diff=%%.2e" %% diff)
"""


@pytest.mark.slow
def test_multichip_production_paths_match():
    """Round-5 production parity (VERDICT item 4): the sharded frame runs the
    mono production machinery — KeyPlan unstable sort (bitwise == stable),
    3-program split (bitwise == fused), fused Pallas projection (interpret
    parity on the CPU mesh; visible-row bitexact on chip)."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    proc = subprocess.run(
        [sys.executable, "-c", PRODUCTION_SCRIPT % {"repo": REPO}],
        capture_output=True, text=True, timeout=900, env=env)
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "PRODUCTION_OK" in proc.stdout, proc.stdout


@pytest.mark.slow
def test_multichip_balanced_bands_match_mono_and_fit():
    """Content-adaptive band boundaries: histogram balancing shrinks the max
    band load, fits a capacity the equal split overflows, and the stitched
    image still matches the mono oracle."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    proc = subprocess.run(
        [sys.executable, "-c", BALANCE_SCRIPT % {"repo": REPO}],
        capture_output=True, text=True, timeout=900, env=env)
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "BALANCE_OK" in proc.stdout, proc.stdout


@pytest.mark.slow
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
