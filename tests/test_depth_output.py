"""Optional depth output (RendererConfig.depth_output=False).

The reference skips the depth texture entirely when the caller passes none
or a .depth32Float target (DepthFirstRenderEncoder.swift:36-38, 60-80); the
TPU equivalent drops the blend's depth accumulator column and output plane.
Color must be bitwise identical with and without depth.
"""
import numpy as np
import pytest

import gsm_renderer_tpu as G
from gsm_renderer_tpu.io.scene import generate_visible_gaussians

W, H = 256, 192


def _scene(n=4000, sh_degree=2, seed=11):
    ds = generate_visible_gaussians(n, sh_degree=sh_degree, seed=seed)
    cam = G.make_camera(W, H)
    return ds.to_input(), cam


@pytest.mark.parametrize("renderer_cls", [
    G.DepthFirstRenderer,
    pytest.param(G.HardwareRenderer, marks=pytest.mark.slow)])
def test_color_only_matches_default(renderer_cls):
    gi, cam = _scene()
    r_full = renderer_cls(G.RendererConfig(sh_degree=2))
    r_nd = renderer_cls(G.RendererConfig(sh_degree=2, depth_output=False))
    out_full = r_full.render(gi, cam, W, H)
    out_nd = r_nd.render(gi, cam, W, H)
    assert out_nd.depth is None
    assert out_full.depth is not None
    np.testing.assert_array_equal(np.asarray(out_full.color),
                                  np.asarray(out_nd.color))


def test_color_only_rgba16(reason="finalize must tolerate depth=None"):
    gi, cam = _scene(n=1500)
    from gsm_renderer_tpu.config import ColorFormat
    r = G.DepthFirstRenderer(G.RendererConfig(
        sh_degree=2, depth_output=False,
        color_format=ColorFormat.RGBA16_FLOAT))
    out = r.render(gi, cam, W, H)
    assert out.depth is None
    assert np.asarray(out.color).dtype == np.float16
