"""Foveated-rendering utility tests (rate maps, warp tables, expansion)."""

import numpy as np
import jax.numpy as jnp

from gsm_renderer_tpu.stereo import (FoveatedStereoTarget, expand_foveated,
                                     make_rate_maps, warp_tables)


def test_rate_maps_shape_and_range():
    t = make_rate_maps(640, 480, center=(0.5, 0.5), min_rate=0.4)
    assert t.rate_x.shape == (640,) and t.rate_y.shape == (480,)
    assert (t.rate_x <= 1.0).all() and (t.rate_x >= 0.4 - 1e-6).all()
    assert t.render_width < 640 and t.render_height < 480
    # full rate at the center
    assert t.rate_x[320] > 0.999


def test_warp_tables_monotone_cover():
    t = make_rate_maps(256, 128)
    xt, yt = warp_tables(t)
    assert xt.shape == (t.render_width,)
    assert (np.diff(xt) > 0).all() and (np.diff(yt) > 0).all()
    assert xt[0] >= 0 and xt[-1] <= 256
    # denser sampling at the center than at the edge
    c = len(xt) // 2
    assert (xt[c + 1] - xt[c]) < (xt[1] - xt[0])


def test_expand_foveated_constant_image():
    t = make_rate_maps(64, 32, min_rate=0.5)
    inter = jnp.full((t.render_height, 2 * t.render_width, 4), 0.25)
    out = np.asarray(expand_foveated(inter, t))
    assert out.shape == (32, 128, 4)
    np.testing.assert_allclose(out, 0.25, atol=1e-5)


def test_expand_foveated_gradient_preserved():
    t = make_rate_maps(64, 32, min_rate=0.5)
    xt, yt = warp_tables(t)
    # intermediate whose value equals its screen x coordinate
    inter = np.tile(xt[None, :, None], (t.render_height, 2, 1)).astype(np.float32)
    inter = inter.reshape(t.render_height, 2 * t.render_width, 1)
    out = np.asarray(expand_foveated(jnp.asarray(inter), t))
    want = np.arange(64) + 0.5
    got = out[16, :64, 0]
    np.testing.assert_allclose(got, want, atol=1.0)
