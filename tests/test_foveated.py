"""Foveated-rendering utility tests (rate maps, warp tables, expansion)."""

import numpy as np
import pytest
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


def _scene_and_stereo(w, h, n=220, seed=2):
    import gsm_renderer_tpu as G
    from gsm_renderer_tpu.io.scene import generate_visible_gaussians
    ds = generate_visible_gaussians(n, sh_degree=1, seed=seed,
                                    scale_range=(0.01, 0.06))
    cam = G.make_camera(w, h)
    stereo = G.make_side_by_side_stereo(cam, ipd=0.1)
    return ds.to_input(), stereo


@pytest.mark.slow
def test_true_foveated_renders_physical_target():
    """render_stereo_foveated rasterizes DIRECTLY into the reduced-rate
    physical target: output is physical-sized, finite, non-black, and its
    expansion matches a full-resolution stereo render in the fovea (where the
    rate is 1.0 the warp is near-identity)."""
    import gsm_renderer_tpu as G

    w, h = 128, 96
    gi, stereo = _scene_and_stereo(w, h)
    t = make_rate_maps(w, h, min_rate=0.4, radius=0.3)
    r = G.DepthFirstRenderer(G.RendererConfig(sh_degree=1), use_xla_blend=True)

    out = r.render_stereo_foveated(gi, stereo, t)
    phys = np.asarray(out.color)
    assert phys.shape == (t.render_height, 2 * t.render_width, 4)
    assert np.isfinite(phys).all()
    assert phys[..., :3].max() > 0.05

    # expand to display and compare against the full-res stereo render;
    # the direct rasterization must be at least as faithful as the legacy
    # render-full-then-compress path (both resample through the same warp, so
    # remaining error is the warp's sub-pixel blur, not a rendering defect)
    disp = np.asarray(expand_foveated(out.color, t, stereo=True))
    full = np.asarray(r.render_stereo(gi, stereo, w, h).color)
    assert disp.shape == full.shape
    comp = r.render_stereo_foveated_compress(gi, stereo, t)
    disp_c = np.asarray(expand_foveated(comp.color, t, stereo=True))

    err_direct = np.abs(disp[..., :3] - full[..., :3]).mean()
    err_compress = np.abs(disp_c[..., :3] - full[..., :3]).mean()
    assert err_direct < max(1.3 * err_compress, 0.01), (err_direct, err_compress)
    assert err_direct < 0.05
    # fovea (rate 1.0): direct must match compress quality there too
    cy, cx = h // 2, w // 2
    sl_y = slice(cy - 10, cy + 10)
    for e in range(2):
        sl_x = slice(e * w + cx - 10, e * w + cx + 10)
        d = np.abs(disp[sl_y, sl_x, :3] - full[sl_y, sl_x, :3]).mean()
        dc = np.abs(disp_c[sl_y, sl_x, :3] - full[sl_y, sl_x, :3]).mean()
        assert d < max(1.3 * dc, 0.01), f"eye {e}: direct {d} vs compress {dc}"


@pytest.mark.slow
def test_foveated_periphery_lod():
    """foveated_lod > 0 drops sub-sample periphery instances (fewer slots)
    while keeping the fovea EXACT (rate 1.0 => the LOD threshold vanishes)
    and the output finite and close to the exact render overall."""
    import gsm_renderer_tpu as G

    w, h = 128, 96
    gi, stereo = _scene_and_stereo(w, h, n=300)
    t = make_rate_maps(w, h, min_rate=0.35, radius=0.2)

    r0 = G.DepthFirstRenderer(G.RendererConfig(sh_degree=1),
                              use_xla_blend=True)
    out0 = r0.render_stereo_foveated(gi, stereo, t)
    r1 = G.DepthFirstRenderer(G.RendererConfig(sh_degree=1, foveated_lod=5.0),
                              use_xla_blend=True)
    out1 = r1.render_stereo_foveated(gi, stereo, t)

    # LOD must actually prune instances
    assert int(out1.header.slot_total) < int(out0.header.slot_total), (
        int(out0.header.slot_total), int(out1.header.slot_total))
    c0, c1 = np.asarray(out0.color), np.asarray(out1.color)
    assert np.isfinite(c1).all()

    # fovea exact: the gaze-center crop is bitwise identical (threshold is
    # exactly 0 at rate 1.0)
    cy = t.render_height // 2
    # physical x of the display fovea center (cumulative rate up to w/2)
    cx = int(np.floor(t.rate_x[: w // 2].sum()))
    for e in range(2):
        sl = (slice(cy - 4, cy + 4),
              slice(e * t.render_width + cx - 4, e * t.render_width + cx + 4))
        np.testing.assert_array_equal(c1[sl], c0[sl])

    # periphery damage is bounded (LOD drops only low-ink splats)
    assert np.abs(c1[..., :3] - c0[..., :3]).mean() < 0.02

    # Pallas interpret path agrees with the XLA mask path under LOD
    from gsm_renderer_tpu.pipelines.depth_first import \
        depth_first_stereo_foveated_frame
    from gsm_renderer_tpu.stereo import foveated_raster_tables
    tabs = foveated_raster_tables(t)
    views, projs, centers, st = stereo.astuple_jax()
    kw = dict(display_width=w, display_height=h,
              render_width=t.render_width, render_height=t.render_height,
              capacity=8192, sh_degree=1, alpha_threshold=0.005,
              total_ink_threshold=2.0, near_plane=stereo.left.near_plane,
              far_plane=stereo.left.far_plane, input_is_srgb=False,
              foveated_lod=5.0)
    outs = [depth_first_stereo_foveated_frame(
        gi, views, projs, centers, st, jnp.asarray(tabs["inv_fit"]),
        jnp.asarray(tabs["coord_x"]), jnp.asarray(tabs["coord_y"]),
        jnp.asarray(tabs["bounds"]), use_xla_blend=xla,
        interpret=not xla, **kw) for xla in (True, False)]
    assert int(outs[0].header.slot_total) == int(outs[1].header.slot_total)
    np.testing.assert_allclose(np.asarray(outs[1].color),
                               np.asarray(outs[0].color), atol=2e-3)


@pytest.mark.slow
def test_foveated_compress_path_still_available():
    """The legacy render-full-then-compress path is kept for comparison and
    must agree with the reference-structure output shape."""
    import gsm_renderer_tpu as G

    w, h = 64, 64
    gi, stereo = _scene_and_stereo(w, h, n=120)
    t = make_rate_maps(w, h, min_rate=0.5)
    r = G.DepthFirstRenderer(G.RendererConfig(sh_degree=1), use_xla_blend=True)
    out = r.render_stereo_foveated_compress(gi, stereo, t)
    assert np.asarray(out.color).shape == (t.render_height,
                                           2 * t.render_width, 4)


def test_foveated_raster_tables_invariants():
    from gsm_renderer_tpu.stereo import foveated_raster_tables

    t = make_rate_maps(128, 96, min_rate=0.4)
    tabs = foveated_raster_tables(t)
    txp = -(-t.render_width // 16)
    typ = -(-t.render_height // 16)
    assert tabs["coord_x"].shape == (txp, 256)
    assert tabs["coord_y"].shape == (typ, 256)
    # coordinates monotone within a tile row
    row = tabs["coord_x"][0].reshape(16, 16)[0]
    assert (np.diff(row) > 0).all()
    # every display tile's physical range is sane and ordered
    assert (tabs["lut_x_lo"] <= tabs["lut_x_hi"]).all()
    assert (tabs["lut_y_lo"] <= tabs["lut_y_hi"]).all()
    assert tabs["lut_x_hi"].max() <= txp - 1


def test_foveated_warped_masks_exact():
    """The one-hot-MXU boundary-gather pre-count mask must agree with the
    in-kernel boundary-table dual-eye predicate (same rects, same test);
    only borderline d2 == cutoff fma disagreements between the two
    compilations are tolerated — those stay output-identical because the
    blend zeroes alpha past r^2 = 9 per pixel."""
    import gsm_renderer_tpu as G
    from gsm_renderer_tpu.kernels import expand as E
    from gsm_renderer_tpu.pipelines.common import pack_record_words
    from gsm_renderer_tpu.ops.project import stereo_project_and_cull
    from gsm_renderer_tpu.stereo import foveated_raster_tables
    import jax.numpy as jnp

    w, h = 128, 96
    gi, stereo = _scene_and_stereo(w, h, n=300, seed=9)
    t = make_rate_maps(w, h, min_rate=0.4, radius=0.3)
    tabs = foveated_raster_tables(t)
    left, right = stereo.left, stereo.right
    views = jnp.stack([jnp.asarray(left.view_matrix),
                       jnp.asarray(right.view_matrix)])
    projs = jnp.stack([jnp.asarray(left.projection_matrix),
                       jnp.asarray(right.projection_matrix)])
    centers = jnp.stack([jnp.asarray(left.position),
                         jnp.asarray(right.position)])
    pr = stereo_project_and_cull(
        gi, views, projs, centers, width=w, height=h, tile_w=16, tile_h=16,
        sh_degree=1, near_plane=0.1, far_plane=10.0, alpha_threshold=0.005,
        total_ink_threshold=2.0, input_is_srgb=False,
        scene_transform=jnp.eye(4))

    # physical rects via the inverse fit (mirrors the frame function)
    inv = tabs["inv_fit"]

    def inv_map(v, axis):
        row = inv[axis]
        tt = (np.asarray(v) - row[10]) / (row[11] - row[10]) * 2.0 - 1.0
        return np.polyval(row[:10], tt), row[12]

    txp = -(-t.render_width // 16)
    typ = -(-t.render_height // 16)
    sx0, mx = inv_map(pr.px_min, 0)
    sx1, _ = inv_map(pr.px_max, 0)
    sy0, my = inv_map(pr.py_min, 1)
    sy1, _ = inv_map(pr.py_max, 1)
    min_tx = np.clip(np.floor((sx0 - mx) / 16).astype(np.int32), 0, txp - 1)
    max_tx = np.clip(np.floor((sx1 + mx) / 16).astype(np.int32), 0, txp - 1)
    min_ty = np.clip(np.floor((sy0 - my) / 16).astype(np.int32), 0, typ - 1)
    max_ty = np.clip(np.floor((sy1 + my) / 16).astype(np.int32), 0, typ - 1)
    rect_w = max_tx - min_tx + 1
    rect_h = max_ty - min_ty + 1

    wl = pack_record_words(pr.record_left)
    wr = pack_record_words(pr.record_right)
    bounds = jnp.asarray(tabs["bounds"])
    fxg = E.warped_bounds_gather(bounds[0], jnp.asarray(min_tx), E.MASK_W + 1)
    fyg = E.warped_bounds_gather(bounds[1], jnp.asarray(min_ty), E.MASK_H + 1)
    fx = [fxg[:, d] for d in range(E.MASK_W + 1)]
    fy = [fyg[:, d] for d in range(E.MASK_H + 1)]
    mask, cnt = E.stereo_warped_tile_masks(
        [wl[:, k] for k in range(3)], [wr[:, k] for k in range(3)],
        jnp.asarray(rect_w), jnp.asarray(rect_h), fx, fy)
    mask = np.asarray(mask)

    # the one-hot gather must reproduce the bounds table exactly, and the
    # production Pallas lane-gather kernel must match it bitwise
    bx, by = tabs["bounds"][0], tabs["bounds"][1]
    for d in range(E.MASK_W + 1):
        np.testing.assert_array_equal(np.asarray(fxg[:, d]),
                                      bx[np.minimum(min_tx + d, 127)])
    fxp, fyp = E.warped_bounds_gather_pallas(
        bounds, jnp.asarray(min_tx), jnp.asarray(min_ty), interpret=True)
    for d in range(E.MASK_W + 1):
        np.testing.assert_array_equal(np.asarray(fxp[d]), np.asarray(fx[d]))
    for d in range(E.MASK_H + 1):
        np.testing.assert_array_equal(np.asarray(fyp[d]), np.asarray(fy[d]))

    # in-kernel-style predicate per window position (the _record_d2min the
    # expand kernel evaluates on the same rects)
    vis = np.asarray(pr.visible)
    n_elig = np.count_nonzero(vis & (rect_w <= E.MASK_W) & (rect_h <= E.MASK_H))
    mismatch = 0
    for p in range(E.MASK_W * E.MASK_H):
        dx, dy = p % E.MASK_W, p // E.MASK_W
        tx = np.minimum(min_tx + dx, 127)
        ty = np.minimum(min_ty + dy, 127)
        x0, x1 = bx[tx], bx[np.minimum(tx + 1, 127)]
        y0, y1 = by[ty], by[np.minimum(ty + 1, 127)]
        d2l = np.asarray(E._record_d2min(
            jnp.asarray(wl[:, 0]), jnp.asarray(wl[:, 1]), jnp.asarray(wl[:, 2]),
            jnp.asarray(x0), jnp.asarray(x1), jnp.asarray(y0), jnp.asarray(y1)))
        d2r = np.asarray(E._record_d2min(
            jnp.asarray(wr[:, 0]), jnp.asarray(wr[:, 1]), jnp.asarray(wr[:, 2]),
            jnp.asarray(x0), jnp.asarray(x1), jnp.asarray(y0), jnp.asarray(y1)))
        true_pass = (vis & (dx < rect_w) & (dy < rect_h)
                     & (np.minimum(d2l, d2r) <= E.STEREO_R2_CUTOFF))
        got = ((mask >> p) & 1).astype(bool) & vis
        mismatch += np.count_nonzero(true_pass != got)
    assert mismatch <= max(3, n_elig // 100), \
        f"{mismatch} mask/predicate disagreements of {n_elig} eligible"


@pytest.mark.slow
def test_foveated_warped_prep_path_matches_mask_override():
    """The fused warped prep (in-kernel boundary gathers + dual-eye masks +
    offset scan + table) must reproduce the explicit mask_override path
    bitwise through fused_binning_words."""
    import gsm_renderer_tpu as G
    from gsm_renderer_tpu.kernels import expand as E
    from gsm_renderer_tpu.pipelines.common import (fused_binning_words,
                                                   pack_record_words)
    from gsm_renderer_tpu.ops.project import stereo_project_and_cull
    from gsm_renderer_tpu.stereo import foveated_raster_tables
    import jax.numpy as jnp

    w, h = 128, 96
    gi, stereo = _scene_and_stereo(w, h, n=260, seed=13)
    t = make_rate_maps(w, h, min_rate=0.4, radius=0.3)
    tabs = foveated_raster_tables(t)
    left, right = stereo.left, stereo.right
    views = jnp.stack([jnp.asarray(left.view_matrix),
                       jnp.asarray(right.view_matrix)])
    projs = jnp.stack([jnp.asarray(left.projection_matrix),
                       jnp.asarray(right.projection_matrix)])
    centers = jnp.stack([jnp.asarray(left.position),
                         jnp.asarray(right.position)])
    pr = stereo_project_and_cull(
        gi, views, projs, centers, width=w, height=h, tile_w=16, tile_h=16,
        sh_degree=1, near_plane=0.1, far_plane=10.0, alpha_threshold=0.005,
        total_ink_threshold=2.0, input_is_srgb=False,
        scene_transform=jnp.eye(4))

    inv = tabs["inv_fit"]

    def inv_map(v, axis):
        row = inv[axis]
        tt = (np.asarray(v) - row[10]) / (row[11] - row[10]) * 2.0 - 1.0
        return np.polyval(row[:10], tt), row[12]

    txp = -(-t.render_width // 16)
    typ = -(-t.render_height // 16)
    sx0, mx = inv_map(pr.px_min, 0)
    sx1, _ = inv_map(pr.px_max, 0)
    sy0, my = inv_map(pr.py_min, 1)
    sy1, _ = inv_map(pr.py_max, 1)
    min_tx = np.clip(np.floor((sx0 - mx) / 16).astype(np.int32), 0, txp - 1)
    max_tx = np.clip(np.floor((sx1 + mx) / 16).astype(np.int32), 0, txp - 1)
    min_ty = np.clip(np.floor((sy0 - my) / 16).astype(np.int32), 0, typ - 1)
    max_ty = np.clip(np.floor((sy1 + my) / 16).astype(np.int32), 0, typ - 1)
    rect_w = max_tx - min_tx + 1
    rect_h = max_ty - min_ty + 1
    visible = np.asarray(pr.visible) & (min_tx <= max_tx) & (min_ty <= max_ty)
    rect_count = np.where(visible, rect_w * rect_h, 0).astype(np.int32)

    wl = pack_record_words(pr.record_left)
    wr = pack_record_words(pr.record_right)
    word_list = ([wl[:, k] for k in range(4)] + [wr[:, k] for k in range(4)])
    bounds = jnp.asarray(tabs["bounds"])
    common = dict(capacity=8192, tiles_x=txp, fused_depth16=False,
                  interpret=True, exact_test="stereo", use_pallas=True,
                  tile_w=16, tile_h=16, warped_bounds=bounds)
    args = (jnp.asarray(visible), jnp.asarray(min_tx), jnp.asarray(min_ty),
            jnp.asarray(max_tx), jnp.asarray(rect_count), pr.depth_key,
            word_list)
    outs_prep = fused_binning_words(*args, use_prep=True, **common)

    fxg = E.warped_bounds_gather(bounds[0], jnp.asarray(min_tx), E.MASK_W + 1)
    fyg = E.warped_bounds_gather(bounds[1], jnp.asarray(min_ty), E.MASK_H + 1)
    wmask, wcnt = E.stereo_warped_tile_masks(
        word_list[0:3], word_list[4:7], jnp.asarray(rect_w),
        jnp.asarray(rect_h), [fxg[:, d] for d in range(E.MASK_W + 1)],
        [fyg[:, d] for d in range(E.MASK_H + 1)])
    eligible = (jnp.asarray(visible) & (jnp.asarray(rect_w) <= E.MASK_W)
                & (jnp.asarray(rect_h) <= E.MASK_H))
    outs_base = fused_binning_words(
        *args, use_prep=False, mask_override=(wmask, wcnt, eligible),
        **common)

    np.testing.assert_array_equal(np.asarray(outs_prep[0]),
                                  np.asarray(outs_base[0]))
    for i, (p, b) in enumerate(zip(outs_prep[1], outs_base[1])):
        np.testing.assert_array_equal(np.asarray(p), np.asarray(b),
                                      err_msg=f"sorted word {i}")
    assert int(outs_prep[2]) == int(outs_base[2])
    assert int(outs_prep[3]) == int(outs_base[3])


@pytest.mark.slow
def test_foveated_pallas_interpret_parity():
    """The warped-coordinate Pallas blend must match the XLA oracle."""
    import gsm_renderer_tpu as G

    w, h = 64, 48
    gi, stereo = _scene_and_stereo(w, h, n=90, seed=4)
    t = make_rate_maps(w, h, min_rate=0.5)
    cfg = G.RendererConfig(sh_degree=1)
    r_x = G.DepthFirstRenderer(cfg, use_xla_blend=True)
    out_x = np.asarray(r_x.render_stereo_foveated(gi, stereo, t).color)

    from gsm_renderer_tpu.pipelines.depth_first import (
        depth_first_stereo_foveated_frame)
    from gsm_renderer_tpu.pipelines.base import instance_capacity
    from gsm_renderer_tpu.stereo import foveated_raster_tables
    import functools, jax
    import jax.numpy as jnp

    tabs = foveated_raster_tables(t)
    left, right = stereo.left, stereo.right
    views = jnp.stack([jnp.asarray(left.view_matrix), jnp.asarray(right.view_matrix)])
    projs = jnp.stack([jnp.asarray(left.projection_matrix), jnp.asarray(right.projection_matrix)])
    centers = jnp.stack([jnp.asarray(left.position), jnp.asarray(right.position)])
    fn = functools.partial(
        depth_first_stereo_foveated_frame,
        display_width=w, display_height=h,
        render_width=t.render_width, render_height=t.render_height,
        capacity=instance_capacity(cfg, gi.count), sh_degree=1,
        alpha_threshold=0.005, total_ink_threshold=2.0,
        near_plane=0.1, far_plane=10.0, input_is_srgb=False,
        use_xla_blend=False, interpret=True)
    out_p = jax.jit(fn)(gi, views, projs, centers, jnp.eye(4),
                        jnp.asarray(tabs["inv_fit"]),
                        jnp.asarray(tabs["coord_x"]), jnp.asarray(tabs["coord_y"]),
                        jnp.asarray(tabs["bounds"]))
    diff = np.abs(np.asarray(out_p.color) - out_x).max()
    assert diff < 0.005, f"pallas-vs-xla foveated diff {diff}"
