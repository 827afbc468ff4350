"""The production 3-program frame split (pre | bare sort | post) must equal
the fused single-program frame exactly.

The split exists because the instance sort is ~2.3x slower when any other
op shares its XLA program (memory-space-assignment pins co-resident
buffers into VMEM and the sort emitter's scratch collapses — BACKLOG.md
composed-sort receipts); DepthFirstRenderer._render_split dispatches the
sort as its own program on local TPU backends.  CPU coverage runs the
Pallas stages in interpret mode.
"""
import numpy as np
import pytest

import gsm_renderer_tpu as G
from gsm_renderer_tpu.io.scene import generate_visible_gaussians
from gsm_renderer_tpu.pipelines import depth_first as DF


@pytest.mark.parametrize("depth_key_bits,tile_id_bits,row_capacity", [
    (32, 16, 0),      # production: tie-free KeyPlan, 2-key unstable sort
    pytest.param(16, 16, 0, marks=pytest.mark.slow),  # fused [tile16|depth16] 1-key sort
    (32, 16, 8192),   # production + per-row exact-span decomposition
])
def test_split_frame_matches_fused(depth_key_bits, tile_id_bits,
                                   row_capacity):
    import jax

    n = 4000
    w, h = 256, 192
    ds = generate_visible_gaussians(n, sh_degree=1,
                                    scale_range=(0.01, 0.05), seed=11)
    cam = G.make_camera(w, h, far=20.0)
    gi = ds.to_input()
    view, proj, center = cam.astuple_jax()

    capacity = 4096 * 4
    statics = dict(width=w, height=h, capacity=capacity, sh_degree=1,
                   alpha_threshold=0.005, total_ink_threshold=2.0,
                   near_plane=0.1, far_plane=20.0, input_is_srgb=False,
                   depth_key_bits=depth_key_bits, tile_id_bits=tile_id_bits,
                   row_capacity=row_capacity)

    fused = DF.depth_first_frame(gi, view, proj, center, interpret=True,
                                 **statics)

    fuse_key, key_plan = DF._mono_key_statics(
        n, width=w, height=h, tile_w=16, tile_h=16,
        depth_key_bits=depth_key_bits, tile_id_bits=tile_id_bits,
        near_plane=0.1, far_plane=20.0, row_capacity=row_capacity)
    if fuse_key:
        num_keys, is_stable, drop = 1, True, 0
    elif key_plan is not None:
        num_keys, is_stable, drop = 2, False, 1
    else:
        num_keys, is_stable, drop = 2, True, 1

    outs = DF.depth_first_pre_frame(gi, view, proj, center, interpret=True,
                                    **statics)
    sort_ops = outs[:-4]
    slot_total, overflow, visible_count, row_total = outs[-4:]
    sorted_ops = DF.sort_frame(*sort_ops, num_keys=num_keys,
                               is_stable=is_stable)
    sorted_key = sorted_ops[0]
    sw = sorted_ops[1 + drop:]
    post_statics = dict(width=w, height=h, capacity=capacity,
                        n_gaussians=n, alpha_threshold=0.005,
                        near_plane=0.1, far_plane=20.0,
                        depth_key_bits=depth_key_bits,
                        tile_id_bits=tile_id_bits,
                        row_capacity=row_capacity)
    split = DF.depth_first_post_frame(sorted_key, *sw, slot_total, overflow,
                                      visible_count, row_total,
                                      interpret=True, **post_statics)

    assert np.array_equal(np.asarray(fused.color), np.asarray(split.color))
    assert np.array_equal(np.asarray(fused.depth), np.asarray(split.depth))
    for field in ("visible_count", "total_instances", "overflow",
                  "slot_total"):
        assert int(getattr(fused.header, field)) == \
            int(getattr(split.header, field)), field


@pytest.mark.parametrize("pipeline", [
    pytest.param("global", marks=pytest.mark.slow), "local"])
def test_d16_split_frame_matches_fused(pipeline):
    from gsm_renderer_tpu.pipelines import common as C
    from gsm_renderer_tpu.pipelines import global_ as GP
    from gsm_renderer_tpu.pipelines import local as LP

    n = 3000
    w, h = 256, 128
    tile_w, tile_h = (32, 16) if pipeline == "global" else (16, 16)
    ds = generate_visible_gaussians(n, sh_degree=1,
                                    scale_range=(0.01, 0.05), seed=3)
    cam = G.make_camera(w, h, far=20.0)
    gi = ds.to_input()
    view, proj, center = cam.astuple_jax()
    capacity = 4096 * 4
    statics = dict(width=w, height=h, capacity=capacity, sh_degree=1,
                   alpha_threshold=0.005, total_ink_threshold=2.0,
                   near_plane=0.1, far_plane=20.0, input_is_srgb=False,
                   tile_w=tile_w, tile_h=tile_h)

    if pipeline == "global":
        fused = GP.global_frame(gi, view, proj, center, interpret=True,
                                **statics)
        depth_mode, mpt = "weighted", 0
    else:
        fused = LP.local_frame(gi, view, proj, center, interpret=True,
                               **statics)
        depth_mode, mpt = "first_hit", 2048

    outs = C.d16_pre_frame(gi, view, proj, center, interpret=True, **statics)
    sort_ops = outs[:-3]
    slot_total, overflow, visible_count = outs[-3:]
    assert len(sort_ops) == 5
    sorted_ops = C.d16_sort_frame(*sort_ops)
    split = C.d16_post_frame(sorted_ops[0], *sorted_ops[1:], slot_total,
                             overflow, visible_count, interpret=True,
                             width=w, height=h, capacity=capacity,
                             tile_w=tile_w, tile_h=tile_h,
                             depth_mode=depth_mode, max_per_tile=mpt)

    assert np.array_equal(np.asarray(fused.color), np.asarray(split.color))
    assert np.array_equal(np.asarray(fused.depth), np.asarray(split.depth))
    for field in ("visible_count", "total_instances", "overflow",
                  "slot_total"):
        assert int(getattr(fused.header, field)) == \
            int(getattr(split.header, field)), field


@pytest.mark.slow
def test_hardware_split_frame_matches_fused():
    """HardwareRenderer's mono frame (no exact test, normalized depth,
    r^2 <= 9 cutoff, full-rect capacity) through the same 3-program split:
    its full-rect expansion has the biggest sort volume of the mono paths,
    so the composed-sort pathology hits it hardest on real hardware."""
    n = 3000
    w, h = 224, 160
    ds = generate_visible_gaussians(n, sh_degree=1,
                                    scale_range=(0.01, 0.05), seed=7)
    cam = G.make_camera(w, h, far=20.0)
    gi = ds.to_input()
    view, proj, center = cam.astuple_jax()

    capacity = 4096 * 8
    hw = dict(exact_tile_test=False, depth_mode="normalized",
              r2_cutoff=9.0, blocks_per_dma=4)
    statics = dict(width=w, height=h, capacity=capacity, sh_degree=1,
                   alpha_threshold=0.005, total_ink_threshold=2.0,
                   near_plane=0.1, far_plane=20.0, input_is_srgb=False,
                   depth_key_bits=32, tile_id_bits=16)

    fused = DF.depth_first_frame(gi, view, proj, center, interpret=True,
                                 **statics, **hw)

    outs = DF.depth_first_pre_frame(
        gi, view, proj, center, interpret=True,
        exact_tile_test=False, **statics)
    sort_ops = outs[:-4]
    slot_total, overflow, visible_count, row_total = outs[-4:]
    sorted_ops = DF.sort_frame(*sort_ops, num_keys=2, is_stable=False)
    split = DF.depth_first_post_frame(
        sorted_ops[0], *sorted_ops[2:], slot_total, overflow, visible_count,
        row_total,
        interpret=True, width=w, height=h, capacity=capacity, n_gaussians=n,
        alpha_threshold=0.005, near_plane=0.1, far_plane=20.0,
        depth_mode="normalized", r2_cutoff=9.0, blocks_per_dma=4)

    assert np.array_equal(np.asarray(fused.color), np.asarray(split.color))
    assert np.array_equal(np.asarray(fused.depth), np.asarray(split.depth))
    for field in ("visible_count", "total_instances", "overflow",
                  "slot_total"):
        assert int(getattr(fused.header, field)) == \
            int(getattr(split.header, field)), field


@pytest.mark.slow
def test_foveated_split_frame_matches_fused():
    """The foveated-stereo 3-program split (warp tables thread through pre
    AND post) must reproduce the fused foveated frame exactly."""
    import jax.numpy as jnp

    from gsm_renderer_tpu.stereo import foveated_raster_tables, make_rate_maps

    n = 2000
    w, h = 160, 128
    ds = generate_visible_gaussians(n, sh_degree=1,
                                    scale_range=(0.01, 0.05), seed=9)
    cam = G.make_camera(w, h, far=20.0)
    stereo = G.make_side_by_side_stereo(cam, ipd=0.15)
    gi = ds.to_input()
    views, projs, centers, st = stereo.astuple_jax()
    tgt = make_rate_maps(w, h, min_rate=0.5, radius=0.3)
    tabs = foveated_raster_tables(tgt)
    inv_fit = jnp.asarray(tabs["inv_fit"])
    coord_x = jnp.asarray(tabs["coord_x"])
    coord_y = jnp.asarray(tabs["coord_y"])
    bounds = jnp.asarray(tabs["bounds"])

    capacity = 4096 * 8
    statics = dict(display_width=w, display_height=h,
                   render_width=tgt.render_width,
                   render_height=tgt.render_height,
                   capacity=capacity, sh_degree=1,
                   alpha_threshold=0.005, total_ink_threshold=2.0,
                   near_plane=0.1, far_plane=20.0, input_is_srgb=False)

    fused = DF.depth_first_stereo_foveated_frame(
        gi, views, projs, centers, st, inv_fit, coord_x, coord_y, bounds,
        interpret=True, **statics)

    outs = DF.depth_first_stereo_foveated_pre_frame(
        gi, views, projs, centers, st, inv_fit, bounds, interpret=True,
        **statics)
    sort_ops = outs[:-4]
    slot_total, overflow, visible_count, total_live = outs[-4:]
    assert len(sort_ops) == 10
    sorted_ops = DF.sort_frame(*sort_ops, num_keys=2, is_stable=False)
    split = DF.depth_first_stereo_foveated_post_frame(
        sorted_ops[0], *sorted_ops[2:], coord_x, coord_y,
        slot_total, overflow, visible_count, total_live, interpret=True,
        render_width=tgt.render_width, render_height=tgt.render_height,
        capacity=capacity, n_gaussians=n, near_plane=0.1, far_plane=20.0)

    assert np.array_equal(np.asarray(fused.color), np.asarray(split.color))
    assert np.array_equal(np.asarray(fused.depth), np.asarray(split.depth))
    for field in ("visible_count", "total_instances", "overflow",
                  "slot_total"):
        assert int(getattr(fused.header, field)) == \
            int(getattr(split.header, field)), field


@pytest.mark.slow
def test_stereo_split_frame_matches_fused():
    n = 2500
    w, h = 192, 128
    ds = generate_visible_gaussians(n, sh_degree=1,
                                    scale_range=(0.01, 0.05), seed=5)
    cam = G.make_camera(w, h, far=20.0)
    stereo = G.make_side_by_side_stereo(cam, ipd=0.15)
    gi = ds.to_input()
    views, projs, centers, st = stereo.astuple_jax()

    capacity = 4096 * 8
    statics = dict(width=w, height=h, capacity=capacity, sh_degree=1,
                   alpha_threshold=0.005, total_ink_threshold=2.0,
                   near_plane=0.1, far_plane=20.0, input_is_srgb=False)

    fused = DF.depth_first_stereo_frame(gi, views, projs, centers, st,
                                        interpret=True, **statics)

    outs = DF.depth_first_stereo_pre_frame(gi, views, projs, centers, st,
                                           interpret=True, **statics)
    sort_ops = outs[:-4]
    slot_total, overflow, visible_count, total_live = outs[-4:]
    assert len(sort_ops) == 10
    sorted_ops = DF.sort_frame(*sort_ops, num_keys=2, is_stable=False)
    split = DF.depth_first_stereo_post_frame(
        sorted_ops[0], *sorted_ops[2:], slot_total, overflow, visible_count,
        total_live, interpret=True, width=w, height=h, capacity=capacity,
        n_gaussians=n, near_plane=0.1, far_plane=20.0)

    assert np.array_equal(np.asarray(fused.color), np.asarray(split.color))
    assert np.array_equal(np.asarray(fused.depth), np.asarray(split.depth))
    for field in ("visible_count", "total_instances", "overflow",
                  "slot_total"):
        assert int(getattr(fused.header, field)) == \
            int(getattr(split.header, field)), field
