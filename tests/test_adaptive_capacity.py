"""Adaptive instance-capacity sizing (pipelines/base.py).

The reference sizes buffers at 4 x maxGaussians but sorts only the actual
``totalInstances`` via GPU-computed indirect dispatch
(prepareDepthFirstDispatchKernel, DepthFirstShaders.metal:2174-2308).  XLA's
static shapes make every sort/expand cost scale with the STATIC capacity, so
the renderers track the measured slot total and lock onto a bucketed capacity
just above it — same frames, smaller static shapes."""

import numpy as np

import gsm_renderer_tpu as G
from gsm_renderer_tpu.io.scene import generate_visible_gaussians
from gsm_renderer_tpu.pipelines.base import instance_capacity


def test_capacity_locks_below_full_model_and_output_is_identical():
    w, h = 256, 192
    n = 20_000
    ds = generate_visible_gaussians(n, sh_degree=1, scale_range=(0.005, 0.03))
    cam = G.make_camera(w, h)
    r = G.DepthFirstRenderer(G.RendererConfig(sh_degree=1))
    full = instance_capacity(r.config, n)

    o1 = r.render(ds.to_input(), cam, w, h)     # full model
    assert int(o1.header.slot_total) < full
    o2 = r.render(ds.to_input(), cam, w, h)     # locked-in capacity
    cap = r._cap_state[(r._mono_key, n)]["cap"]
    assert int(o1.header.slot_total) < cap < full
    assert int(o2.header.overflow) == 0
    np.testing.assert_array_equal(np.asarray(o1.color), np.asarray(o2.color))

    # steady state: the locked capacity is reused without re-reading the device
    o3 = r.render(ds.to_input(), cam, w, h)
    assert r._cap_state[(r._mono_key, n)]["cap"] == cap
    np.testing.assert_array_equal(np.asarray(o1.color), np.asarray(o3.color))


def test_explicit_max_instances_disables_adaptation():
    w, h = 128, 96
    n = 5_000
    ds = generate_visible_gaussians(n, sh_degree=0, scale_range=(0.01, 0.05))
    cam = G.make_camera(w, h)
    r = G.DepthFirstRenderer(G.RendererConfig(sh_degree=0,
                                              max_instances=65536))
    r.render(ds.to_input(), cam, w, h)
    r.render(ds.to_input(), cam, w, h)
    assert r.pick_capacity(n) == instance_capacity(r.config, n)
    assert not r._cap_state


def test_adaptive_capacity_grows_past_model_on_overflow():
    """slot_total is computed before the capacity clamp, so an overflowed
    frame still reports true demand; the next capacity grows past the 4x
    model (HardwareRenderer-style on-demand growth) up to the 4x-of-model
    ceiling."""
    import types
    n = 5_000
    r = G.DepthFirstRenderer(G.RendererConfig(sh_degree=0))
    full = instance_capacity(r.config, n)
    fb = types.SimpleNamespace(slot_total=np.int32(3 * full),
                               overflow=np.int32(1),
                               total_instances=np.int32(0),
                               visible_count=np.int32(0))
    r._cap_feedback = {(r._mono_key, n): fb}
    cap = r.pick_capacity(n, kind=r._mono_key)
    assert 3 * full <= cap <= 4 * full


def test_adaptive_capacity_off_switch():
    w, h = 128, 96
    n = 5_000
    ds = generate_visible_gaussians(n, sh_degree=0, scale_range=(0.01, 0.05))
    cam = G.make_camera(w, h)
    r = G.DepthFirstRenderer(G.RendererConfig(sh_degree=0),
                             adaptive_capacity=False)
    r.render(ds.to_input(), cam, w, h)
    r.render(ds.to_input(), cam, w, h)
    assert r.pick_capacity(n) == instance_capacity(r.config, n)


def test_pick_row_capacity_policy():
    """Row-capacity sizing (per-row exact-span decomposition): full 2x model
    without feedback, margin-bucketed from header.row_total, and 0 (full-rect
    fallback) when demand exceeds the 4x-of-model growth ceiling."""
    import types

    import numpy as np

    r = G.DepthFirstRenderer(G.RendererConfig())
    n = 10_000
    full = -(-r.ROW_CAPACITY_FACTOR * n // 4096) * 4096
    assert r.pick_row_capacity(n, kind=r._mono_key) == full

    def fb(total):
        return types.SimpleNamespace(row_total=np.int32(total))

    r._cap_feedback = {(r._mono_key, n): fb(30_000)}
    r._cap_state = None
    cap = r.pick_row_capacity(n, kind=r._mono_key)
    assert 30_000 <= cap <= 4 * full

    # demand unknown (-1): keep trying the full model
    r._cap_feedback = {(r._mono_key, n): fb(-1)}
    r._cap_state = None
    assert r.pick_row_capacity(n, kind=r._mono_key) == full

    # demand beyond the ceiling: disable (0), and re-enable when it lightens
    r._cap_feedback = {(r._mono_key, n): fb(4 * full + 1)}
    r._cap_state = None
    assert r.pick_row_capacity(n, kind=r._mono_key) == 0
    r._cap_feedback = {(r._mono_key, n): fb(12_000)}
    r._cap_state = None
    assert r.pick_row_capacity(n, kind=r._mono_key) >= 12_000
