"""Per-row exact-span decomposition of oversized rects (RendererConfig.
row_expand; kernels/expand.row_expand_pallas).

The reference exact-counts EVERY gaussian's touched tiles at projection
(DepthFirstShaders.metal:181-219).  The TPU's 8x4 mask window covers small
rects; oversized rects previously fell back to full-rect expansion whose
dead slots dominate heavy-tailed scenes (2.29M of 7.07M slots at the
BASELINE realistic-PLY row — scratch/realprobe.py).  The row decomposition
replaces each oversized rect with per-tile-row virtual rows carrying
closed-form ellipse column spans.  Output must stay bitwise identical: the
spans are conservative supersets and the in-kernel exact test still prunes
the boundary slop.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import gsm_renderer_tpu as G
from gsm_renderer_tpu.io.scene import generate_visible_gaussians
from gsm_renderer_tpu.kernels import expand as E
from gsm_renderer_tpu.ops.project import project_and_cull
from gsm_renderer_tpu.pipelines import depth_first as DF
from gsm_renderer_tpu.ops import binning as B

W, H = 256, 192
TILES_X = W // 16


def _heavy_scene(n=1500, seed=13):
    """Scene with a heavy tail: many rects exceed the 8x4 mask window."""
    ds = generate_visible_gaussians(n, sh_degree=1,
                                    scale_range=(0.01, 0.6), seed=seed)
    cam = G.make_camera(W, H, far=20.0)
    return ds.to_input(), cam


def _prep_table(gi, cam, count_rows):
    """Mono prep table via the XLA projection (the use_prep construction of
    pipelines/common.binning_sort_operands)."""
    view, proj, center = cam.astuple_jax()
    pr = project_and_cull(
        gi, view, proj, center, width=W, height=H, tile_w=16, tile_h=16,
        sh_degree=1, near_plane=0.1, far_plane=20.0, alpha_threshold=0.005,
        total_ink_threshold=2.0, input_is_srgb=False)
    from gsm_renderer_tpu.pipelines.common import pack_record_words
    words = pack_record_words(pr.record)
    rect_w = pr.max_tx - pr.min_tx + 1
    rect_word0 = B.pack_rect_word(pr.min_tx, pr.min_ty, rect_w)
    rect_word0 = jnp.where(pr.visible, rect_word0,
                           rect_word0 | jnp.uint32(E.CULLED_BIT))
    rect_h = pr.rect_count // jnp.maximum(rect_w, 1)
    key_plan = B.make_key_plan(TILES_X * (H // 16), gi.count,
                               near_plane=0.1, far_plane=20.0)
    dsw = key_plan.normalize(pr.depth_key)
    tab = E.binning_prep_pallas(
        rect_word0, rect_h, dsw, [words[:, k] for k in range(4)],
        tile_w=16, tile_h=16, alpha_threshold=0.005, interpret=True,
        mode="mono", count_rows=count_rows)
    return tab, pr


def test_row_expand_pallas_matches_xla():
    """Interpret-mode kernel vs the pure-XLA mirror: bitwise-equal tables."""
    gi, cam = _heavy_scene()
    tab1, _pr = _prep_table(gi, cam, count_rows=True)
    r_cap = 32768
    t_pal, ov_pal = E.row_expand_pallas(tab1, n=gi.count, row_capacity=r_cap,
                                        tile_w=16, tile_h=16,
                                        alpha_threshold=0.005, interpret=True)
    t_xla, ov_xla = E.row_expand_xla(tab1, n=gi.count, row_capacity=r_cap,
                                     tile_w=16, tile_h=16,
                                     alpha_threshold=0.005)
    assert int(ov_pal) == int(ov_xla) == 0
    np.testing.assert_array_equal(np.asarray(t_pal), np.asarray(t_xla))


def test_row_span_superset_of_exact_test():
    """Every tile passing the kernel's exact test must lie inside the
    emitted span (the span may only ADD boundary tiles, never drop one)."""
    gi, cam = _heavy_scene(n=600, seed=29)
    tab1, pr = _prep_table(gi, cam, count_rows=True)
    n = gi.count
    off1 = np.asarray(tab1[0].reshape(-1)[:n + 1])
    flat = [np.asarray(tab1[p].reshape(-1)[:n]).view(np.uint32)
            for p in range(tab1.shape[0])]
    rect_u = flat[1]
    t_xla, _ = E.row_expand_xla(tab1, n=n, row_capacity=8192,
                                tile_w=16, tile_h=16, alpha_threshold=0.005)
    total_rows = int(off1[n])
    rect2 = np.asarray(t_xla[1].reshape(-1)[:total_rows]).view(np.uint32)

    # collect every candidate (gaussian, tile) of the oversized rects, then
    # evaluate the kernel's exact test in ONE vectorized call
    gs, txs, tys, lo_ok, hi_ok = [], [], [], [], []
    for g in range(n):
        ru = int(rect_u[g])
        if ru & (E.CULLED_BIT | E.MASKED_BIT):
            continue
        min_tx = ru & 0x3FF
        min_ty = (ru >> 10) & 0x3FF
        rect_w = (ru >> 20) & 0x3FF
        r0, r1 = int(off1[g]), int(off1[g + 1])
        for dy in range(r1 - r0):
            r2 = int(rect2[r0 + dy])
            span_lo = r2 & 0x3FF
            span_w = 0 if (r2 & E.CULLED_BIT) else (r2 >> 20) & 0x3FF
            ty = min_ty + dy
            for tx in range(min_tx, min_tx + rect_w):
                gs.append(g)
                txs.append(tx)
                tys.append(ty)
                lo_ok.append(span_lo <= tx)
                hi_ok.append(tx < span_lo + span_w)
    assert len(gs) > 200  # the scene must actually exercise oversized rects
    gs = np.asarray(gs)
    in_span = np.asarray(lo_ok) & np.asarray(hi_ok)
    passes = np.asarray(E._exact_tile_test(
        jnp.asarray(flat[4][gs]), jnp.asarray(flat[5][gs]),
        jnp.asarray(flat[6][gs]), jnp.asarray(flat[7][gs]),
        jnp.asarray(txs, dtype=jnp.int32), jnp.asarray(tys, dtype=jnp.int32),
        16.0, 16.0, 0.005))
    escaped = passes & ~in_span
    assert not escaped.any(), (
        f"{escaped.sum()} passing tiles outside their spans, e.g. "
        f"gaussian {gs[escaped.argmax()]}")
    assert passes.sum() > 50


@pytest.mark.parametrize("use_xla_project", [
    False, pytest.param(True, marks=pytest.mark.slow)])
def test_row_frame_bitwise_identical(use_xla_project):
    """Full frame with the row decomposition vs without: bitwise-identical
    color/depth, strictly smaller slot space on a heavy-tailed scene."""
    gi, cam = _heavy_scene(n=600, seed=17)
    view, proj, center = cam.astuple_jax()
    statics = dict(width=W, height=H, capacity=4096 * 24, sh_degree=1,
                   alpha_threshold=0.005, total_ink_threshold=2.0,
                   near_plane=0.1, far_plane=20.0, input_is_srgb=False,
                   interpret=True, pallas_project=not use_xla_project)
    base = DF.depth_first_frame(gi, view, proj, center, **statics)
    rows = DF.depth_first_frame(gi, view, proj, center, row_capacity=8192,
                                **statics)
    assert rows.header.row_total is not None
    assert int(base.header.overflow) == 0
    assert int(rows.header.overflow) == 0
    np.testing.assert_array_equal(np.asarray(base.color),
                                  np.asarray(rows.color))
    np.testing.assert_array_equal(np.asarray(base.depth),
                                  np.asarray(rows.depth))
    assert int(rows.header.slot_total) < int(base.header.slot_total)
    assert int(rows.header.total_instances) == int(base.header.total_instances)


def test_row_overflow_flag():
    """Row demand beyond the row capacity must raise header.overflow (rows
    drop, frame degrades gracefully — the reference's capacity-clamp
    contract)."""
    gi, cam = _heavy_scene(n=800, seed=5)
    view, proj, center = cam.astuple_jax()
    statics = dict(width=W, height=H, capacity=4096 * 16, sh_degree=1,
                   alpha_threshold=0.005, total_ink_threshold=2.0,
                   near_plane=0.1, far_plane=20.0, input_is_srgb=False,
                   interpret=True)
    out = DF.depth_first_frame(gi, view, proj, center, row_capacity=256,
                               **statics)
    assert int(out.header.overflow) == 1
