"""Exact per-tile instance-list membership AND order vs the NumPy oracle.

The north star demands pixel-exact depth ordering; color-tolerance compares can
hide swapped instances.  This test extracts the pipeline's actual sorted
per-tile instance lists (by carrying the gaussian index as an extra sort
operand through the production binning) and asserts them equal to the oracle's
depth-ordered lists (reference semantics: stable depth sort then stable tile
sort — DepthFirstShaders.metal:866-1256)."""

import numpy as np
import jax.numpy as jnp
import pytest

import gsm_renderer_tpu as G
from gsm_renderer_tpu.io.scene import generate_visible_gaussians
from gsm_renderer_tpu.ops import binning as B
from gsm_renderer_tpu.ops.project import project_and_cull
from gsm_renderer_tpu.pipelines.common import (fused_binning_words,
                                               pack_record_words)
from reference_impl import render_reference


def _pipeline_tile_lists(ds, cam, w, h, capacity=8192, use_pallas=False,
                         precount=True, key_plan=False):
    tiles_x, tiles_y = -(-w // 16), -(-h // 16)
    gi = ds.to_input()
    view, proj, center = cam.astuple_jax()
    pr = project_and_cull(
        gi, view, proj, center, width=w, height=h, tile_w=16, tile_h=16,
        sh_degree=0, near_plane=0.1, far_plane=10.0, alpha_threshold=0.005,
        total_ink_threshold=2.0, input_is_srgb=False)
    words = pack_record_words(pr.record)
    # carry the gaussian index as a 5th word so sorted instances are identifiable
    idx_word = jnp.arange(gi.count, dtype=jnp.uint32)
    word_list = [words[:, k] for k in range(4)] + [idx_word]
    kw = dict(interpret=True) if use_pallas else {}
    if key_plan:
        plan = B.make_key_plan(tiles_x * tiles_y, gi.count,
                               near_plane=0.1, far_plane=10.0)
        assert plan is not None
        kw["key_plan"] = plan
    sorted_tile, sw, _total, overflow = fused_binning_words(
        pr.visible, pr.min_tx, pr.min_ty, pr.max_tx, pr.rect_count,
        pr.depth_key, word_list, capacity=capacity, tiles_x=tiles_x,
        fused_depth16=False, use_pallas=use_pallas, exact_test=True,
        precount=precount, **kw)
    assert int(overflow) == 0
    starts, counts = B.extract_tile_ranges(sorted_tile, tiles_x * tiles_y)
    starts, counts = np.asarray(starts), np.asarray(counts)
    sidx = np.asarray(sw[4])
    lists = {}
    for t in range(tiles_x * tiles_y):
        if counts[t]:
            lists[t] = sidx[starts[t]:starts[t] + counts[t]].tolist()
    return lists


@pytest.mark.parametrize("use_pallas,precount,key_plan", [
    (False, True, False),   # XLA mirror path with exact pre-count masks
    (False, False, False),  # XLA mirror, full-rect counting + post-test
    (True, True, False),    # PRODUCTION Pallas expand (interpret), pre-count masks
    (True, False, False),   # production Pallas expand, in-kernel exact test
    (True, True, True),     # production path + tie-free KeyPlan unstable sort
    (False, True, True),    # XLA mirror + KeyPlan
])
def test_depth_first_exact_per_tile_ordering(use_pallas, precount, key_plan):
    w, h = 128, 96
    ds = generate_visible_gaussians(400, sh_degree=0, scale_range=(0.01, 0.08))
    cam = G.make_camera(w, h)
    _c, _d, aux = render_reference(
        ds, cam.view_matrix, cam.projection_matrix, cam.position, w, h,
        sh_degree=0)
    oracle = {
        t: [aux["records"][r]["index"] for r in ranks]
        for t, ranks in aux["tile_lists"].items()
    }
    got = _pipeline_tile_lists(ds, cam, w, h, use_pallas=use_pallas,
                               precount=precount, key_plan=key_plan)

    assert set(got) == set(oracle), (
        f"tile membership differs: only-pipeline={set(got) - set(oracle)}, "
        f"only-oracle={set(oracle) - set(got)}")
    for t in sorted(oracle):
        assert got[t] == oracle[t], (
            f"tile {t}: pipeline order {got[t]} != oracle order {oracle[t]}")
    assert sum(len(v) for v in oracle.values()) > 400  # non-trivial scene


@pytest.mark.slow
def test_exact_ordering_mid_scale_production_path():
    """Mid-scale (60k gaussians, 640x480) exact per-tile ORDER on the full
    production path (Pallas prep + expand + tie-free KeyPlan unstable sort,
    interpret mode) vs the NumPy oracle — closes the gap between 'sort
    primitive stable at 1M' (test_scale) and 'pipeline exact at 400'
    (above): the windowed-DMA expand and the KeyPlan bit packing only
    exercise their interesting regimes (multi-row windows, dense tiles,
    depth keys spanning many high bits) at scale."""
    w, h = 640, 480
    n = 60_000
    ds = generate_visible_gaussians(n, sh_degree=0,
                                    scale_range=(0.002, 0.015), seed=21)
    cam = G.make_camera(w, h)
    _c, _d, aux = render_reference(
        ds, cam.view_matrix, cam.projection_matrix, cam.position, w, h,
        sh_degree=0)
    oracle = {
        t: [aux["records"][r]["index"] for r in ranks]
        for t, ranks in aux["tile_lists"].items()
    }
    got = _pipeline_tile_lists(ds, cam, w, h, capacity=4096 * 64,
                               use_pallas=True, precount=True, key_plan=True)
    assert set(got) == set(oracle), (
        f"tile membership differs: {len(set(got) - set(oracle))} extra, "
        f"{len(set(oracle) - set(got))} missing")
    mismatches = [t for t in sorted(oracle) if got[t] != oracle[t]]
    assert not mismatches, (
        f"{len(mismatches)} tiles out of order; first: tile {mismatches[0]}: "
        f"{got[mismatches[0]][:8]} != {oracle[mismatches[0]][:8]}")
    total = sum(len(v) for v in oracle.values())
    assert total > 90_000, total  # the scene is genuinely mid-scale


@pytest.mark.parametrize("use_pallas", [False, True])
def test_key_plan_tie_order_constant_depth(use_pallas):
    """Adversarial tie scene: EVERY gaussian at the same view depth.  The
    reference's stable sorts order equal (tile, depth) pairs by gaussian
    input index; the tie-free KeyPlan keys must reproduce that exactly
    through an UNSTABLE sort (the index rides in key2's low bits)."""
    w, h = 128, 96
    ds = generate_visible_gaussians(300, sh_degree=0, scale_range=(0.01, 0.08))
    ds.positions[:, 2] = 2.0  # constant camera-space depth -> all keys tie
    cam = G.make_camera(w, h)
    _c, _d, aux = render_reference(
        ds, cam.view_matrix, cam.projection_matrix, cam.position, w, h,
        sh_degree=0)
    oracle = {
        t: [aux["records"][r]["index"] for r in ranks]
        for t, ranks in aux["tile_lists"].items()
    }
    got = _pipeline_tile_lists(ds, cam, w, h, use_pallas=use_pallas,
                               key_plan=True)
    assert set(got) == set(oracle)
    heavy = 0
    for t in sorted(oracle):
        heavy = max(heavy, len(oracle[t]))
        assert got[t] == oracle[t], (
            f"tile {t}: tie order {got[t]} != oracle {oracle[t]}")
    assert heavy >= 3  # ties actually share tiles
