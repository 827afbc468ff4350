"""Stereo side-by-side rendering tests (DepthFirstRenderer.renderStereo
equivalent)."""

import numpy as np
import pytest

import gsm_renderer_tpu as G
from gsm_renderer_tpu.io.scene import generate_visible_gaussians


def test_stereo_side_by_side_basics():
    w, h = 128, 96
    ds = generate_visible_gaussians(300, sh_degree=1, scale_range=(0.01, 0.06))
    cam = G.make_camera(w, h)
    stereo = G.make_side_by_side_stereo(cam, ipd=0.2)
    r = G.DepthFirstRenderer(G.RendererConfig(sh_degree=1), use_xla_blend=True)
    out = r.render_stereo(ds.to_input(), stereo, w, h)
    color = np.asarray(out.color)
    assert color.shape == (h, 2 * w, 4)
    assert np.isfinite(color).all()
    left = color[:, :w, :3]
    right = color[:, w:, :3]
    assert left.max() > 0.05 and right.max() > 0.05
    # eyes must differ (parallax) but be similar overall
    assert np.abs(left - right).max() > 0.01
    assert np.abs(left.mean() - right.mean()) < 0.05


@pytest.mark.slow
def test_stereo_matches_mono_at_zero_ipd():
    """With ipd=0 both eyes equal the mono camera; each half must match a mono
    render of the same scene (modulo the stereo path's full-union-rect binning
    and r^2 cutoff semantics)."""
    w, h = 96, 96
    ds = generate_visible_gaussians(200, sh_degree=0, scale_range=(0.01, 0.05))
    cam = G.make_camera(w, h)
    stereo = G.make_side_by_side_stereo(cam, ipd=0.0)
    r = G.DepthFirstRenderer(G.RendererConfig(sh_degree=0), use_xla_blend=True)
    out_s = r.render_stereo(ds.to_input(), stereo, w, h)
    color = np.asarray(out_s.color)
    left = color[:, :w, :]
    right = color[:, w:, :]
    np.testing.assert_allclose(left, right, atol=1e-5)

    out_m = r.render(ds.to_input(), cam, w, h)
    mono = np.asarray(out_m.color)
    # r^2<=9 cutoff drops the faint skirt beyond 3 sigma; exact-test list
    # differences are also sub-alpha-threshold: tolerance covers both
    np.testing.assert_allclose(left[..., :3], mono[..., :3], atol=0.03)


@pytest.mark.slow
def test_stereo_foveated():
    """Foveated stereo: reduced-res render + warp expansion
    (rasterization-rate-map equivalent)."""
    from gsm_renderer_tpu.stereo import make_rate_maps
    w, h = 128, 96
    ds = generate_visible_gaussians(300, sh_degree=0, scale_range=(0.01, 0.06))
    cam = G.make_camera(w, h)
    stereo = G.make_side_by_side_stereo(cam, ipd=0.1)
    target = make_rate_maps(w, h, min_rate=0.5)
    assert target.render_width < w and target.render_height < h

    r = G.DepthFirstRenderer(G.RendererConfig(sh_degree=0), use_xla_blend=True)
    out = r.render_stereo_foveated(ds.to_input(), stereo, target)
    color = np.asarray(out.color)
    # physical (reduced-rate) target, like the reference's foveated drawable
    assert color.shape == (target.render_height, 2 * target.render_width, 4)
    assert np.isfinite(color).all()
    assert color[..., :3].max() > 0.05

    # display-side expansion recovers the full-res image at the fovea (rate 1)
    from gsm_renderer_tpu.stereo import expand_foveated
    expanded = np.asarray(expand_foveated(out.color, target, stereo=True))
    full = np.asarray(r.render_stereo(ds.to_input(), stereo, w, h).color)
    cy, cx = h // 2, w // 2
    a = expanded[cy - 8:cy + 8, cx - 8:cx + 8, :3]
    b = full[cy - 8:cy + 8, cx - 8:cx + 8, :3]
    # double bilinear resampling softens high-frequency splat noise slightly
    assert np.abs(a - b).mean() < 0.06


def test_stereo_invisible_eye_unbounded_screen_no_nan():
    """A gaussian visible in one eye whose OTHER eye projects to an unbounded
    screen coordinate (perspective divide w ~ 0) must not poison the frame:
    the invisible eye's record mean is replaced (not offset) with the finite
    off-screen constant, so no f16 overflow -> inf -> NaN alpha can occur."""
    from gsm_renderer_tpu.ops.project import stereo_project_and_cull

    w, h = 64, 64
    ds = generate_visible_gaussians(64, sh_degree=0, scale_range=(0.02, 0.05))
    left = G.make_camera(w, h, far=50.0)
    # right eye rotated 90 degrees about Y: the scene sits in its image plane,
    # so w ~ 0 and raw screen coordinates explode for that eye
    rot = np.array([[0, 0, -1, 0], [0, 1, 0, 0], [1, 0, 0, 0], [0, 0, 0, 1]],
                   np.float32)
    right = G.make_camera(w, h, view_matrix=rot, far=50.0)
    stereo = G.StereoCameraParams(left=left, right=right)

    gi = ds.to_input()
    pr = stereo_project_and_cull(
        gi,
        np.stack([left.view_matrix, right.view_matrix]),
        np.stack([left.projection_matrix, right.projection_matrix]),
        np.stack([left.position, right.position]),
        width=w, height=h, tile_w=16, tile_h=16, sh_degree=0,
        near_plane=0.1, far_plane=50.0, alpha_threshold=0.005,
        total_ink_threshold=2.0, input_is_srgb=False)
    assert int(np.asarray(pr.visible).sum()) > 0
    assert np.isfinite(np.asarray(pr.record_right.mean_x, np.float32)).all()
    assert np.isfinite(np.asarray(pr.record_right.mean_y, np.float32)).all()

    r = G.DepthFirstRenderer(G.RendererConfig(sh_degree=0), use_xla_blend=True)
    out = r.render_stereo(gi, stereo, w, h)
    color = np.asarray(out.color)
    assert np.isfinite(color).all()
    assert color[:, :w, :3].max() > 0.05  # left eye still renders the scene


@pytest.mark.slow
def test_stereo_dual_eye_pallas_matches_xla():
    """The production single-pass dual-eye Pallas blend (n_eyes=2, both eyes'
    accumulators in one kernel over the shared tile list —
    depthFirstStereoRender, DepthFirstShaders.metal:1825-1982) must match the
    per-eye XLA oracle blend within the early-exit bound."""
    import jax.numpy as jnp
    from gsm_renderer_tpu.pipelines.depth_first import depth_first_stereo_frame

    w, h = 128, 96
    ds = generate_visible_gaussians(300, sh_degree=1, scale_range=(0.01, 0.06))
    cam = G.make_camera(w, h)
    stereo = G.make_side_by_side_stereo(cam, ipd=0.2)
    gi = ds.to_input()
    left, right = stereo.left, stereo.right
    views = jnp.stack([jnp.asarray(left.view_matrix, jnp.float32),
                       jnp.asarray(right.view_matrix, jnp.float32)])
    projs = jnp.stack([jnp.asarray(left.projection_matrix, jnp.float32),
                       jnp.asarray(right.projection_matrix, jnp.float32)])
    centers = jnp.stack([jnp.asarray(left.position, jnp.float32),
                         jnp.asarray(right.position, jnp.float32)])
    st = jnp.eye(4, dtype=jnp.float32)
    kw = dict(width=w, height=h, capacity=16 * 4096, sh_degree=1,
              alpha_threshold=0.005, total_ink_threshold=2.0,
              near_plane=0.1, far_plane=100.0, input_is_srgb=False)
    o_x = depth_first_stereo_frame(gi, views, projs, centers, st,
                                   use_xla_blend=True, **kw)
    o_p = depth_first_stereo_frame(gi, views, projs, centers, st,
                                   interpret=True, **kw)
    cx, cp = np.asarray(o_x.color), np.asarray(o_p.color)
    assert np.isfinite(cp).all()
    assert np.abs(cx - cp).max() < 0.005  # early-exit bound (1/255)
    assert int(o_p.header.overflow) == 0


@pytest.mark.slow
def test_hardware_foveated_parity_with_depth_first():
    """HardwareRenderer foveated stereo (the reference attaches the
    rasterization rate map to its stereo path too — HardwareRenderer.swift:
    592-727, README feature table): same warped binning and dual-eye blend
    as DepthFirst foveated, alpha-normalized depth."""
    from gsm_renderer_tpu.stereo import make_rate_maps

    w, h = 128, 96
    ds = generate_visible_gaussians(300, sh_degree=1, scale_range=(0.01, 0.06))
    cam = G.make_camera(w, h)
    stereo = G.make_side_by_side_stereo(cam, ipd=0.15)
    gi = ds.to_input()
    tgt = make_rate_maps(w, h, min_rate=0.5, radius=0.3)
    cfg = G.RendererConfig(sh_degree=1)
    out_hw = G.HardwareRenderer(cfg, use_xla_blend=True).render_stereo_foveated(
        gi, stereo, tgt)
    out_df = G.DepthFirstRenderer(cfg, use_xla_blend=True).render_stereo_foveated(
        gi, stereo, tgt)

    c_hw = np.asarray(out_hw.color)
    c_df = np.asarray(out_df.color)
    assert c_hw.shape == (tgt.render_height, 2 * tgt.render_width, 4)
    np.testing.assert_allclose(c_hw, c_df, atol=1e-5)
    assert c_hw[..., :3].max() > 0.05

    # depth: hardware normalizes by alpha; where alpha is solid they agree
    d_hw = np.asarray(out_hw.depth)
    d_df = np.asarray(out_df.depth)
    a = c_df[..., 3]
    solid = a > 0.5
    assert solid.any()
    np.testing.assert_allclose(d_hw[solid], d_df[solid] / a[solid], rtol=1e-3,
                               atol=1e-3)


def test_hardware_stereo_parity_with_depth_first():
    """HardwareRenderer stereo (HardwareRenderer.swift:604-727): same binning,
    projection and r^2 <= 9 dual-eye blend as the DepthFirst stereo path, so
    the color output must match; depth is alpha-normalized
    (postprocessFragmentShader semantics) instead of alpha-weighted."""
    w, h = 96, 96
    ds = generate_visible_gaussians(250, sh_degree=1, scale_range=(0.01, 0.06))
    cam = G.make_camera(w, h)
    stereo = G.make_side_by_side_stereo(cam, ipd=0.15)
    gi = ds.to_input()
    cfg = G.RendererConfig(sh_degree=1)
    out_hw = G.HardwareRenderer(cfg, use_xla_blend=True).render_stereo(
        gi, stereo, w, h)
    out_df = G.DepthFirstRenderer(cfg, use_xla_blend=True).render_stereo(
        gi, stereo, w, h)

    c_hw = np.asarray(out_hw.color)
    c_df = np.asarray(out_df.color)
    assert c_hw.shape == (h, 2 * w, 4)
    np.testing.assert_allclose(c_hw, c_df, atol=1e-5)
    assert c_hw[..., :3].max() > 0.05

    # depth: hardware normalizes by alpha; where alpha is solid they agree
    d_hw = np.asarray(out_hw.depth)
    d_df = np.asarray(out_df.depth)
    a = c_df[..., 3]
    solid = a > 0.5
    assert solid.any()
    np.testing.assert_allclose(d_hw[solid], d_df[solid] / a[solid], rtol=1e-3,
                               atol=1e-3)
