"""Tests for the Local and Hardware renderer variants (reference comparison +
semantic checks)."""

import numpy as np
import pytest

import gsm_renderer_tpu as G
from gsm_renderer_tpu.io.scene import generate_visible_gaussians
from reference_impl import render_reference


def test_local_matches_reference_color():
    w, h = 128, 96
    ds = generate_visible_gaussians(250, sh_degree=0)
    cam = G.make_camera(w, h)
    ref_color, _, aux = render_reference(
        ds, cam.view_matrix, cam.projection_matrix, cam.position, w, h,
        sh_degree=0, tile_w=16, tile_h=16)
    r = G.LocalRenderer(G.RendererConfig(sh_degree=0), use_xla_blend=True)
    out = r.render(ds.to_input(), cam, w, h)
    assert int(out.header.visible_count) == aux["visible"]
    # 16-bit depth keys can reorder near-equal depths; wider tolerance
    np.testing.assert_allclose(np.asarray(out.color)[..., :3],
                               ref_color[..., :3], atol=0.05)


def test_local_first_hit_depth():
    """Local depth output = depth of the first alpha>0.1 instance, NOT the
    alpha-weighted depth (LocalShaders.metal:529-537)."""
    w, h = 64, 64
    # two large overlapping gaussians at different depths
    import numpy as np
    from gsm_renderer_tpu.io.scene import GaussianDataset
    pos = np.array([[0.0, 0.0, 2.0], [0.0, 0.0, 4.0]], np.float32)
    scales = np.full((2, 3), 0.4, np.float32)
    quats = np.tile(np.array([0, 0, 0, 1], np.float32), (2, 1))
    ops = np.array([0.6, 0.9], np.float32)
    harm = np.zeros((2, 1, 3), np.float32)
    harm[:, 0, :] = 0.5
    ds = GaussianDataset(pos, scales, quats, ops, harm)
    cam = G.make_camera(w, h)
    r = G.LocalRenderer(G.RendererConfig(sh_degree=0), use_xla_blend=True)
    out = r.render(ds.to_input(), cam, w, h)
    center_depth = float(np.asarray(out.depth)[h // 2, w // 2])
    # first significant hit is the near gaussian at depth 2
    assert abs(center_depth - 2.0) < 0.05, center_depth


def test_hardware_matches_reference():
    w, h = 128, 96
    ds = generate_visible_gaussians(250, sh_degree=0)
    cam = G.make_camera(w, h)
    ref_color, ref_depth, aux = render_reference(
        ds, cam.view_matrix, cam.projection_matrix, cam.position, w, h,
        sh_degree=0, tile_w=16, tile_h=16, hardware_mode=True)
    r = G.HardwareRenderer(G.RendererConfig(sh_degree=0), use_xla_blend=True)
    out = r.render(ds.to_input(), cam, w, h)
    assert int(out.header.visible_count) == aux["visible"]
    np.testing.assert_allclose(np.asarray(out.color)[..., :3],
                               ref_color[..., :3], atol=0.02)


def test_hardware_back_to_front_equivalent():
    """Front-to-back and back-to-front compositing produce the same radiance
    (the reference offers both blend orders — HardwareRenderer.swift:793-803)."""
    w, h = 96, 96
    ds = generate_visible_gaussians(200, sh_degree=0)
    cam = G.make_camera(w, h)
    r1 = G.HardwareRenderer(G.RendererConfig(sh_degree=0), use_xla_blend=True)
    r2 = G.HardwareRenderer(G.RendererConfig(sh_degree=0, back_to_front=True),
                            use_xla_blend=True)
    o1 = r1.render(ds.to_input(), cam, w, h)
    o2 = r2.render(ds.to_input(), cam, w, h)
    # early-exit asymmetry bounds the difference at ~1/255
    np.testing.assert_allclose(np.asarray(o1.color)[..., :3],
                               np.asarray(o2.color)[..., :3], atol=0.02)


@pytest.mark.slow
def test_all_four_renderers_agree_roughly():
    """The four strategies render the same scene with small strategy-specific
    differences (reference PLYBenchmarkTests compares all five variants
    visually)."""
    w, h = 96, 96
    ds = generate_visible_gaussians(200, sh_degree=1, scale_range=(0.01, 0.05))
    cam = G.make_camera(w, h)
    cfg = G.RendererConfig(sh_degree=1)
    outs = {}
    for name, cls in [("df", G.DepthFirstRenderer), ("gl", G.GlobalRenderer),
                      ("lo", G.LocalRenderer), ("hw", G.HardwareRenderer)]:
        outs[name] = np.asarray(
            cls(cfg, use_xla_blend=True).render(ds.to_input(), cam, w, h).color)
    for name in ("gl", "lo", "hw"):
        diff = np.abs(outs[name][..., :3] - outs["df"][..., :3]).mean()
        assert diff < 0.01, (name, diff)
