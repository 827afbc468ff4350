"""Config-limit enforcement and precision-knob wiring tests.

Covers the BufferValidation-style input limits
(GaussianRendererProtocol.swift:326-416) and the DepthFirst
tile_id_precision / depth_sort_key_precision combinations
(DepthFirstRenderer.swift:45-50).
"""

import numpy as np
import pytest

import gsm_renderer_tpu as G
from gsm_renderer_tpu.config import (DepthSortKeyPrecision, RendererConfig,
                                     TileIdPrecision)
from gsm_renderer_tpu.io.scene import generate_visible_gaussians
from gsm_renderer_tpu.types import RendererError


def scene(n=64, seed=0):
    ds = generate_visible_gaussians(n, sh_degree=0, seed=seed)
    gi = G.make_gaussian_input(ds.positions, ds.scales, ds.rotations,
                               ds.opacities, ds.harmonics)
    cam = G.make_camera(64, 64, far=20.0)
    return gi, cam


def test_max_gaussians_enforced():
    gi, cam = scene(64)
    r = G.DepthFirstRenderer(RendererConfig(max_gaussians=32),
                             use_xla_blend=True)
    with pytest.raises(RendererError, match="max_gaussians"):
        r.render(gi, cam, 64, 64)


def test_max_surface_enforced():
    gi, cam = scene(8)
    r = G.DepthFirstRenderer(RendererConfig(max_width=32, max_height=32),
                             use_xla_blend=True)
    with pytest.raises(RendererError, match="exceeds configured maximum"):
        r.render(gi, cam, 64, 64)
    with pytest.raises(RendererError, match="invalid render size"):
        r.render(gi, cam, 0, 16)


def test_tile_id_bits16_rejects_huge_grids():
    gi, cam = scene(8)
    cfg = RendererConfig(max_width=8192, max_height=8192,
                         tile_id_precision=TileIdPrecision.BITS16)
    r = G.DepthFirstRenderer(cfg, use_xla_blend=True)
    # 4112x4112 -> 257*257 = 66049 tiles > 65535
    with pytest.raises(ValueError, match="BITS16"):
        r.render(gi, cam, 4112, 4112)


def test_fused_16bit_key_matches_two_key_sort():
    """tile16+depth16 uses the fused single-key sort; its output must be
    identical to the two-key sort at the same 16-bit depth quantization
    (same ordering, same tie-break-by-input-order)."""
    gi, cam = scene(256, seed=3)
    base = RendererConfig(depth_sort_key_precision=DepthSortKeyPrecision.BITS16,
                          tile_id_precision=TileIdPrecision.BITS32)
    fused = RendererConfig(depth_sort_key_precision=DepthSortKeyPrecision.BITS16,
                           tile_id_precision=TileIdPrecision.BITS16)
    out_a = G.DepthFirstRenderer(base, use_xla_blend=True).render(gi, cam, 64, 64)
    out_b = G.DepthFirstRenderer(fused, use_xla_blend=True).render(gi, cam, 64, 64)
    np.testing.assert_array_equal(np.asarray(out_a.color),
                                  np.asarray(out_b.color))
    np.testing.assert_array_equal(np.asarray(out_a.depth),
                                  np.asarray(out_b.depth))
    assert int(out_b.header.visible_count) > 0


def test_color_format_rgba16():
    """RendererConfig.color_format (GaussianRendererProtocol.swift:204-212):
    RGBA16_FLOAT returns float16 color/depth (the reference's rgba16Float /
    r16Float render targets) quantized once at assembly from the f32
    accumulators; RGBA32_FLOAT (default) returns float32."""
    import jax.numpy as jnp
    from gsm_renderer_tpu.config import ColorFormat

    gi, cam = scene(200, seed=5)
    out32 = G.DepthFirstRenderer(
        RendererConfig(sh_degree=1), use_xla_blend=True).render(gi, cam, 64, 64)
    out16 = G.DepthFirstRenderer(
        RendererConfig(sh_degree=1, color_format=ColorFormat.RGBA16_FLOAT),
        use_xla_blend=True).render(gi, cam, 64, 64)
    assert out32.color.dtype == jnp.float32
    assert out16.color.dtype == jnp.float16
    assert out16.depth.dtype == jnp.float16
    np.testing.assert_array_equal(
        np.asarray(out16.color),
        np.asarray(out32.color.astype(jnp.float16)))
    assert int(out16.header.visible_count) > 0
