"""End-to-end pipeline tests: DepthFirst/Global vs the independent NumPy
reference renderer on small synthetic scenes (reference test strategy:
DepthFirstUnitTests / GlobalUnitTests pipeline smoke tests with CPU oracles)."""

import numpy as np
import pytest

import gsm_renderer_tpu as G
from gsm_renderer_tpu.io.scene import generate_grid_gaussians, generate_visible_gaussians
from reference_impl import render_reference


def _compare(out, ref_color, ref_depth, aux, tol=0.02):
    color = np.asarray(out.color)
    np.testing.assert_allclose(color[..., :3], ref_color[..., :3], atol=tol)
    np.testing.assert_allclose(color[..., 3], ref_color[..., 3], atol=tol)
    np.testing.assert_allclose(np.asarray(out.depth), ref_depth, atol=tol * 10)


@pytest.mark.parametrize("sh_degree", [0, 2])
def test_depthfirst_matches_reference(sh_degree):
    w, h = 128, 96
    ds = generate_grid_gaussians(300, sh_degree=sh_degree, xy_extent=1.2)
    cam = G.make_camera(w, h)
    ref_color, ref_depth, aux = render_reference(
        ds, cam.view_matrix, cam.projection_matrix, cam.position, w, h,
        sh_degree=sh_degree)

    r = G.DepthFirstRenderer(G.RendererConfig(sh_degree=sh_degree),
                             use_xla_blend=True)
    out = r.render(ds.to_input(), cam, w, h)

    assert int(out.header.visible_count) == aux["visible"]
    assert int(out.header.overflow) == 0
    assert np.asarray(out.color)[..., :3].max() > 0.05  # scene not black
    _compare(out, ref_color, ref_depth, aux)


def test_depthfirst_opengl_convention():
    """Z-sign agnosticism: the same scene mirrored for the OpenGL convention
    must render identically (reference exercises both conventions —
    PLYBenchmarkTests.swift:106-113)."""
    w, h = 128, 96
    ds = generate_grid_gaussians(200, sh_degree=0)
    cam_cv = G.make_camera(w, h, convention="opencv")
    r = G.DepthFirstRenderer(use_xla_blend=True)
    out_cv = r.render(ds.to_input(), cam_cv, w, h)

    ds_gl = generate_grid_gaussians(200, sh_degree=0)
    ds_gl.positions = ds_gl.positions * np.array([1, 1, -1], np.float32)
    # mirror z of the rotations too: conjugate quaternion x, y components
    ds_gl.rotations = ds_gl.rotations * np.array([-1, -1, 1, 1], np.float32)
    cam_gl = G.make_camera(w, h, convention="opengl")
    out_gl = r.render(ds_gl.to_input(), cam_gl, w, h)

    np.testing.assert_allclose(np.asarray(out_cv.color),
                               np.asarray(out_gl.color), atol=0.02)


def test_global_matches_reference():
    w, h = 128, 96
    ds = generate_visible_gaussians(250, sh_degree=0)
    cam = G.make_camera(w, h)
    # Global uses 32x16 tiles and 16-bit half depth keys; ordering differences
    # with the f32-ordered NumPy reference are possible for near-equal depths,
    # so compare with a slightly wider tolerance.
    ref_color, ref_depth, aux = render_reference(
        ds, cam.view_matrix, cam.projection_matrix, cam.position, w, h,
        sh_degree=0, tile_w=32, tile_h=16)

    r = G.GlobalRenderer(G.RendererConfig(sh_degree=0), use_xla_blend=True)
    out = r.render(ds.to_input(), cam, w, h)
    assert int(out.header.visible_count) == aux["visible"]
    _compare(out, ref_color, ref_depth, aux, tol=0.03)


def test_header_invariants():
    """Header invariant auditing (reference: DepthFirstUnitTests.swift:562-658)."""
    w, h = 160, 120
    ds = generate_visible_gaussians(500, sh_degree=0)
    cam = G.make_camera(w, h)
    r = G.DepthFirstRenderer(use_xla_blend=True)
    out = r.render(ds.to_input(), cam, w, h)
    visible = int(out.header.visible_count)
    total = int(out.header.total_instances)
    assert 0 < visible <= 500
    assert total >= visible  # every visible gaussian touches >= 1 tile
    assert int(out.header.overflow) == 0


def test_fp16_input_renders():
    w, h = 96, 64
    ds = generate_grid_gaussians(150, sh_degree=1)
    cam = G.make_camera(w, h)
    r = G.DepthFirstRenderer(G.RendererConfig(sh_degree=1,
                                              precision=G.Precision.FLOAT16),
                             use_xla_blend=True)
    out16 = r.render(ds.to_input(G.Precision.FLOAT16), cam, w, h)
    out32 = r.render(ds.to_input(G.Precision.FLOAT32), cam, w, h)
    # fp16 quantization of inputs should cause only small differences
    np.testing.assert_allclose(np.asarray(out16.color),
                               np.asarray(out32.color), atol=0.08)


def test_empty_scene():
    w, h = 64, 64
    ds = generate_grid_gaussians(10)
    ds.positions[:, 2] = -5.0  # all behind the camera
    cam = G.make_camera(w, h)
    r = G.DepthFirstRenderer(use_xla_blend=True)
    out = r.render(ds.to_input(), cam, w, h)
    assert int(out.header.visible_count) == 0
    assert np.asarray(out.color).max() == 0.0


def test_overflow_graceful():
    """Capacity overflow sets the flag and still renders (reference overflow
    clamps: DepthFirstShaders.metal:2187-2194)."""
    w, h = 64, 64
    # dense overlapping gaussians: instance demand far above the 4096-slot
    # minimum capacity
    ds = generate_grid_gaussians(3000, xy_extent=0.3,
                                 scale_range=(0.1, 0.3))
    cam = G.make_camera(w, h)
    cfgo = G.RendererConfig(max_instances=256)
    r = G.DepthFirstRenderer(cfgo, use_xla_blend=True)
    out = r.render(ds.to_input(), cam, w, h)
    assert int(out.header.overflow) == 1
    assert np.isfinite(np.asarray(out.color)).all()
