"""Interpret-mode coverage for the production Pallas kernels.

Round-1 gap: every pipeline test ran ``use_xla_blend=True`` so
``expand_slots_pallas`` / ``blend_tiles_pallas`` had zero automated coverage
(regressions were only caught by the manual TPU bench).  These tests run the
kernels in Pallas interpret mode against their XLA mirrors — the same pairing
the reference uses for its standalone kernel tests
(DepthFirstUnitTests.swift:120-468).
"""

import numpy as np
import jax.numpy as jnp
import pytest

import gsm_renderer_tpu as G
from gsm_renderer_tpu.kernels import expand as E
from gsm_renderer_tpu.io.scene import generate_visible_gaussians
from gsm_renderer_tpu.pipelines.depth_first import (
    depth_first_frame, depth_first_stereo_frame)


def _expand_inputs(rng, n, n_aux, tiles_x=12, tiles_y=8):
    counts = rng.integers(1, 5, n).astype(np.int32)
    min_tx = rng.integers(0, tiles_x - 3, n).astype(np.int32)
    min_ty = rng.integers(0, tiles_y - 3, n).astype(np.int32)
    rect_w = rng.integers(1, 4, n).astype(np.int32)
    culled = rng.random(n) < 0.15
    rect = (min_tx | (min_ty << 10) | (rect_w << 20)).astype(np.uint32)
    rect = np.where(culled, rect | np.uint32(E.CULLED_BIT), rect)
    aux = rng.integers(0, 2**32, (n, n_aux), dtype=np.uint64).astype(np.uint32)
    return jnp.asarray(counts), jnp.asarray(rect), jnp.asarray(aux)


@pytest.mark.parametrize("fused_depth16", [False, True])
def test_expand_pallas_interpret_matches_xla(rng, fused_depth16):
    counts, rect, aux = _expand_inputs(rng, 600, 5)
    kw = dict(capacity=4096, tiles_x=12, fused_depth16=fused_depth16)
    outs_p = E.expand_slots_pallas(counts, rect, aux, interpret=True, **kw)
    outs_x = E.expand_slots_xla(counts, rect, aux, **kw)
    assert len(outs_p) == len(outs_x)
    for i, (p, x) in enumerate(zip(outs_p, outs_x)):
        np.testing.assert_array_equal(np.asarray(p), np.asarray(x),
                                      err_msg=f"output {i}")


def test_binning_prep_interpret_matches_xla_table(rng):
    """The fused Pallas prep (masks + pre-counts + in-kernel offset scan +
    plane-major table) must reproduce the XLA-built combined table exactly
    (binning_inputs + exact_tile_masks + cumsum + _pad_rows/stack)."""
    from gsm_renderer_tpu.pipelines.common import binning_inputs, \
        pack_record_words
    from gsm_renderer_tpu.ops.project import project_and_cull
    # realistic quantized records via the actual projection path (random f16
    # bit patterns make degenerate conics — sigma ~1e-4 px — whose f32
    # minQuadRect is precision-dominated and legitimately differs between
    # compilations; the quantizer never produces those)
    n, w, h = 900, 480, 320
    ds = generate_visible_gaussians(n, sh_degree=1,
                                    scale_range=(0.005, 0.12), seed=7)
    cam = G.make_camera(w, h, far=20.0)
    view, proj, center = cam.astuple_jax()
    pr = project_and_cull(ds.to_input(), view, proj, center, width=w,
                          height=h, tile_w=16, tile_h=16, sh_degree=1,
                          near_plane=0.1, far_plane=20.0,
                          alpha_threshold=0.005, total_ink_threshold=2.0,
                          input_is_srgb=False)
    words = pack_record_words(pr.record)
    word_list = [words[:, k] for k in range(4)]
    depth = pr.depth_key
    visible = pr.visible
    min_tx, min_ty, max_tx = (np.asarray(pr.min_tx), np.asarray(pr.min_ty),
                              np.asarray(pr.max_tx))
    rect_w = np.asarray(max_tx - min_tx + 1)
    rect_count = pr.rect_count
    rect_h = np.asarray(rect_count) // np.maximum(rect_w, 1)

    # XLA reference masks (binning_inputs: exact_tile_masks + count rules)
    counts_x, rect_word_x, tile_mask_x, aux = binning_inputs(
        visible, jnp.asarray(min_tx), jnp.asarray(min_ty),
        jnp.asarray(max_tx), rect_count, depth, word_list, exact_test=True)

    # Pallas prep table
    from gsm_renderer_tpu.ops import binning as B
    rect_word0 = B.pack_rect_word(jnp.asarray(min_tx), jnp.asarray(min_ty),
                                  jnp.asarray(rect_w))
    rect_word0 = jnp.where(visible, rect_word0,
                           rect_word0 | jnp.uint32(E.CULLED_BIT))
    tab_p = np.asarray(E.binning_prep_pallas(
        rect_word0, jnp.asarray(rect_h), depth, word_list,
        interpret=True)).view(np.uint32)
    assert tab_p.shape[0] == 8

    flat = tab_p.reshape(8, -1)
    off_p = flat[0, :n + 1].view(np.int32)
    rect_p = flat[1, :n]
    mask_p = flat[2, :n]

    # 1) pass-through planes are exact copies
    for k, src in enumerate([depth] + word_list):
        np.testing.assert_array_equal(flat[3 + k, :n], np.asarray(src))

    # 2) structural consistency: the offsets plane is the exclusive scan of
    #    the counts implied by the kernel's OWN masks + rules, and the
    #    MASKED/CULLED bits agree with them
    vis = np.asarray(visible)
    eligible = vis & (rect_w <= E.MASK_W) & (rect_h <= E.MASK_H)
    pcnt = np.array([bin(m).count("1") for m in mask_p], dtype=np.int32)
    counts_impl = np.where(vis, np.where(eligible, pcnt, rect_w * rect_h), 0)
    culled = ~vis | (eligible & (pcnt == 0))
    counts_impl = np.maximum(counts_impl, 1)
    np.testing.assert_array_equal(
        off_p, np.concatenate([[0], np.cumsum(counts_impl)]))
    base = np.asarray(rect_word0) & np.uint32(0x3FFFFFFF)
    expect_rect = (base
                   | np.where(eligible, np.uint32(E.MASKED_BIT), 0)
                   | np.where(culled, np.uint32(E.CULLED_BIT), 0))
    np.testing.assert_array_equal(rect_p, expect_rect)
    # off-plane tail is OFFSET_PAD
    assert (flat[0, n + 1:].view(np.int32) == E.OFFSET_PAD).all()

    # 3) mask parity with the XLA exact_tile_masks: identical except for
    #    borderline d2min == cutoff conics, where XLA's fma contraction may
    #    differ between the two compilations (semantically negligible —
    #    instances whose peak in-tile alpha sits exactly at the threshold)
    diff = np.count_nonzero(mask_p != np.asarray(tile_mask_x))
    assert diff <= 3, f"{diff} mask mismatches of {n}"


@pytest.mark.parametrize("fused_depth16,stereo", [
    pytest.param(False, False, marks=pytest.mark.slow),
    pytest.param(True, False, marks=pytest.mark.slow),
    (False, True)])
def test_fused_binning_prep_path_matches_nonprep(rng, fused_depth16, stereo):
    """fused_binning_words' use_prep fast path (binning_prep_pallas +
    prebuilt-table expand) must reproduce the non-prep path exactly — for
    BOTH key layouts (fused_depth16=True is the Global/Local configuration)
    and for the 8-word dual-eye stereo configuration."""
    from gsm_renderer_tpu.pipelines.common import (fused_binning_words,
                                                   pack_record_words)
    from gsm_renderer_tpu.ops.project import (project_and_cull,
                                              stereo_project_and_cull)
    n, w, h = 700, 480, 320
    ds = generate_visible_gaussians(n, sh_degree=1,
                                    scale_range=(0.005, 0.10), seed=11)
    cam = G.make_camera(w, h, far=20.0)
    kw = dict(width=w, height=h, tile_w=16, tile_h=16, sh_degree=1,
              near_plane=0.1, far_plane=20.0, alpha_threshold=0.005,
              total_ink_threshold=2.0, input_is_srgb=False)
    if stereo:
        st = G.make_side_by_side_stereo(cam, ipd=0.08)
        views, projs, centers, tr = st.astuple_jax()
        pr = stereo_project_and_cull(ds.to_input(), views, projs, centers,
                                     scene_transform=tr, **kw)
        wl_ = pack_record_words(pr.record_left)
        wr_ = pack_record_words(pr.record_right)
        word_list = ([wl_[:, k] for k in range(4)]
                     + [wr_[:, k] for k in range(4)])
        exact = "stereo"
    else:
        view, proj, center = cam.astuple_jax()
        pr = project_and_cull(ds.to_input(), view, proj, center, **kw)
        words = pack_record_words(pr.record)
        word_list = [words[:, k] for k in range(4)]
        exact = True
    depth = (pr.depth_key >> 16 if fused_depth16 else pr.depth_key)
    common = dict(capacity=8192, tiles_x=30, fused_depth16=fused_depth16,
                  interpret=True, exact_test=exact, use_pallas=True)
    outs_prep = fused_binning_words(
        pr.visible, pr.min_tx, pr.min_ty, pr.max_tx, pr.rect_count,
        depth, word_list, use_prep=True, **common)
    outs_base = fused_binning_words(
        pr.visible, pr.min_tx, pr.min_ty, pr.max_tx, pr.rect_count,
        depth, word_list, use_prep=False, **common)
    # (sorted_tile, sorted word tuple, total, overflow)
    np.testing.assert_array_equal(np.asarray(outs_prep[0]),
                                  np.asarray(outs_base[0]))
    for i, (p, b) in enumerate(zip(outs_prep[1], outs_base[1])):
        np.testing.assert_array_equal(np.asarray(p), np.asarray(b),
                                      err_msg=f"sorted word {i}")
    assert int(outs_prep[2]) == int(outs_base[2])
    assert int(outs_prep[3]) == int(outs_base[3])


def test_expand_pallas_interpret_overflow(rng):
    counts, rect, aux = _expand_inputs(rng, 3000, 5)
    outs_p = E.expand_slots_pallas(counts, rect, aux, capacity=4096, tiles_x=12,
                                   interpret=True)
    outs_x = E.expand_slots_xla(counts, rect, aux, capacity=4096, tiles_x=12)
    assert int(outs_p[-1]) == 1  # overflow flagged
    for p, x in zip(outs_p, outs_x):
        np.testing.assert_array_equal(np.asarray(p), np.asarray(x))


def _frame_kwargs(w, h, n):
    return dict(width=w, height=h, capacity=4096, sh_degree=1,
                alpha_threshold=0.005, total_ink_threshold=2.0,
                near_plane=0.1, far_plane=20.0, input_is_srgb=False)


def test_depth_first_frame_pallas_interpret_matches_xla():
    """Full mono frame through the production kernels (interpret) vs the XLA
    mirror path — covers expand (exact test) + blend end to end."""
    w, h = 96, 64
    ds = generate_visible_gaussians(200, sh_degree=1, scale_range=(0.01, 0.06))
    cam = G.make_camera(w, h, far=20.0)
    gi = ds.to_input()
    view, proj, center = cam.astuple_jax()
    kw = _frame_kwargs(w, h, 200)

    out_x = depth_first_frame(gi, view, proj, center, use_xla_blend=True, **kw)
    out_p = depth_first_frame(gi, view, proj, center, use_xla_blend=False,
                              interpret=True, **kw)
    assert int(out_p.header.visible_count) == int(out_x.header.visible_count)
    assert int(out_p.header.overflow) == 0
    assert np.asarray(out_p.color)[..., :3].max() > 0.05
    np.testing.assert_allclose(np.asarray(out_p.color),
                               np.asarray(out_x.color), atol=2e-3)
    np.testing.assert_allclose(np.asarray(out_p.depth),
                               np.asarray(out_x.depth), atol=2e-2)


def _synth_blend_inputs(rng, tiles_x, tiles_y, cap, n_live):
    """Quantized record words + matching XLA-oracle attribute table."""
    from gsm_renderer_tpu.kernels import blend as K
    n_t = tiles_x * tiles_y
    mx = rng.uniform(0, tiles_x * 16, n_live).astype(np.float32)
    my = rng.uniform(0, tiles_y * 16, n_live).astype(np.float32)
    s1 = rng.uniform(0.6, 12.0, n_live).astype(np.float32)
    s2 = rng.uniform(0.6, 12.0, n_live).astype(np.float32)
    th = rng.uniform(0, np.pi, n_live).astype(np.float32)
    op = rng.integers(1, 256, n_live).astype(np.float32) / 255.0
    col = rng.integers(0, 256, (n_live, 3)).astype(np.float32) / 255.0
    dep = rng.uniform(0.1, 50.0, n_live).astype(np.float32)

    def f16b(x):
        return np.asarray(x, np.float16).view(np.uint16).astype(np.uint32)

    thq = np.round(th / np.pi * 65535.0).astype(np.uint32)
    w0 = f16b(mx) | (f16b(my) << 16)
    w1 = thq | (f16b(s1) << 16)
    w2 = f16b(s2) | (f16b(dep) << 16)
    w3 = (np.round(col[:, 0] * 255).astype(np.uint32)
          | (np.round(col[:, 1] * 255).astype(np.uint32) << 8)
          | (np.round(col[:, 2] * 255).astype(np.uint32) << 16)
          | (np.round(op * 255).astype(np.uint32) << 24))

    per = n_live // n_t
    starts = (np.arange(n_t) * per).astype(np.int32)
    counts = np.full(n_t, per, np.int32)
    counts[min(3, n_t - 1)] = 0          # empty-tile path
    counts[min(5, n_t - 1)] = per - 7    # dead tail slots within the span
    words = [np.zeros(cap, np.uint32) for _ in range(4)]
    for k, w in enumerate((w0, w1, w2, w3)):
        words[k][:n_live] = w
    t5 = min(5, n_t - 1)
    for k in range(4):
        words[k][starts[t5] + counts[t5]:starts[t5] + per] = 0
    table = K.build_words_table([jnp.asarray(w) for w in words], cap)

    # oracle attrs from the DECODED (quantized) values, like the kernel
    def deco(bits):
        return np.frombuffer(np.asarray(bits, np.uint16).tobytes(),
                             np.float16).astype(np.float32)
    mx_d, my_d = deco(w0 & 0xFFFF), deco(w0 >> 16)
    s1_d = np.maximum(deco(w1 >> 16), 1e-4)
    s2_d = np.maximum(deco(w2 & 0xFFFF), 1e-4)
    dep_d = deco(w2 >> 16)
    th_d = (w1 & 0xFFFF).astype(np.float32) * (np.pi / 65535.0)
    c, s = np.cos(th_d), np.sin(th_d)
    a1, b1 = c / s1_d, s / s1_d
    a2, b2 = -s / s2_d, c / s2_d

    def padc(x):
        o = np.zeros(cap, np.float32)
        o[:n_live] = x
        return o
    attrs = dict(a1=padc(a1), b1=padc(b1), c1=padc(-(a1 * mx_d + b1 * my_d)),
                 a2=padc(a2), b2=padc(b2), c2=padc(-(a2 * mx_d + b2 * my_d)),
                 r=padc((w3 & 0xFF) / 255.0), g=padc(((w3 >> 8) & 0xFF) / 255.0),
                 b=padc(((w3 >> 16) & 0xFF) / 255.0), depth=padc(dep_d),
                 op=padc(((w3 >> 24) & 0xFF) / 255.0))
    for k in attrs:
        attrs[k][starts[t5] + counts[t5]:starts[t5] + per] = 0.0
    attr_table = K.build_blend_table(
        {k: jnp.asarray(v) for k, v in attrs.items()}, cap)
    return table, attr_table, jnp.asarray(starts), jnp.asarray(counts), per


@pytest.mark.parametrize("emode,r2,warp,smode", [
    ("mxu", 0.0, False, "split16"), ("mxu", 9.0, False, "split16"),
    ("mxu", 0.0, True, "split16"), ("vpu", 0.0, True, "split16"),
    ("mxu", 0.0, False, "reduce"), ("vpu", 0.0, False, "reduce"),
    ("mxu", 0.0, True, "reduce"),
])
def test_blend_exponent_modes_interpret_match_oracle(rng, emode, r2, warp,
                                                     smode):
    """exponent_mode='mxu' (one-matmul exponent, bf16 hi/lo split) and
    scan_mode='reduce' (tree reduction of the composed block state) must
    match the XLA oracle within the split's ~2^-18 precision — incl. the
    r2-cutoff compare rewrite and the tile-centered warped row tables."""
    from gsm_renderer_tpu.kernels import blend as K
    tiles_x, tiles_y = 6, 4
    table, attr_table, starts, counts, per = _synth_blend_inputs(
        rng, tiles_x, tiles_y, cap=1024, n_live=900)
    pc = None
    if warp:
        px = np.arange(16, dtype=np.float32)
        cx = np.stack([tx * 16 + px * (1.0 + 0.4 * tx / tiles_x)
                       for tx in range(tiles_x)])
        cy = np.stack([ty * 16 + px * (1.0 + 0.3 * ty / tiles_y)
                       for ty in range(tiles_y)])
        pc = (jnp.asarray(np.tile(cx, (1, 16))),       # x varies fastest
              jnp.asarray(np.repeat(cy, 16, axis=1)))
    oc, od = K.blend_tiles_xla(attr_table, starts, counts, tiles_x=tiles_x,
                               tiles_y=tiles_y, max_per_tile=per,
                               r2_cutoff=r2, pixel_coords=pc)
    tc, td = K.blend_tiles_pallas(table, starts, counts, tiles_x=tiles_x,
                                  tiles_y=tiles_y, interpret=True,
                                  r2_cutoff=r2, pixel_coords=pc,
                                  exponent_mode=emode, scan_mode=smode)
    # r2 boundary flips move alpha by up to op*exp(-r2/2); wider tolerance
    catol, datol = (8e-3, 0.4) if r2 > 0 else (2e-3, 5e-2)
    np.testing.assert_allclose(np.asarray(tc), np.asarray(oc), atol=catol)
    np.testing.assert_allclose(np.asarray(td), np.asarray(od), atol=datol)


def test_blend_mxu_exponent_32x16_tiles(rng):
    """Global-renderer tile shape (32x16, P=512) through the MXU exponent:
    regression for the bf16-exactness bug — corner-anchored rows produce
    x'^2 up to 961, which bf16 rounds by up to 2 (mid-tile centering keeps
    every row product <= 256, exact)."""
    from gsm_renderer_tpu.kernels import blend as K
    # the synth helper builds a (8*16)x(3*16) px field; reinterpret the same
    # pixel space as 4x3 tiles of 32x16 (spans are arbitrary per-tile lists)
    table, attr_table, starts, counts, per = _synth_blend_inputs(
        rng, 8, 3, cap=1024, n_live=600)
    oc, od = K.blend_tiles_xla(attr_table, starts[:12], counts[:12],
                               tiles_x=4, tiles_y=3, max_per_tile=per,
                               tile_w=32, tile_h=16)
    for smode in ("split16", "reduce"):
        tc, td = K.blend_tiles_pallas(table, starts[:12], counts[:12],
                                      tiles_x=4, tiles_y=3, interpret=True,
                                      tile_w=32, tile_h=16,
                                      exponent_mode="mxu", scan_mode=smode)
        np.testing.assert_allclose(np.asarray(tc), np.asarray(oc), atol=2e-3)
        np.testing.assert_allclose(np.asarray(td), np.asarray(od), atol=5e-2)


@pytest.mark.parametrize("emode,smode", [
    ("vpu", "split16"), ("mxu", "split16"), ("vpu", "reduce"),
])
def test_blend_no_depth_color_bitexact(rng, emode, smode):
    """depth_mode='none' (RendererConfig.depth_output=False — the reference's
    nil/.depth32Float depth-target skip, DepthFirstRenderEncoder.swift:36-38)
    must return bitwise-identical COLOR with depth=None across the scan and
    exponent modes whose accumulator width it changes."""
    from gsm_renderer_tpu.kernels import blend as K
    tiles_x, tiles_y = 6, 4
    table, _attr_table, starts, counts, per = _synth_blend_inputs(
        rng, tiles_x, tiles_y, cap=1024, n_live=900)
    tc, td = K.blend_tiles_pallas(table, starts, counts, tiles_x=tiles_x,
                                  tiles_y=tiles_y, interpret=True,
                                  exponent_mode=emode, scan_mode=smode)
    nc, nd = K.blend_tiles_pallas(table, starts, counts, tiles_x=tiles_x,
                                  tiles_y=tiles_y, interpret=True,
                                  depth_mode="none",
                                  exponent_mode=emode, scan_mode=smode)
    assert nd is None and td is not None
    # CPU interpret: the (128, 3) contraction vectorizes with a different
    # summation order than (128, 4) — up to 1 ULP on one channel.  On chip
    # the MXU's systolic accumulation order over the contracting dim is
    # column-count-independent and the frames are bitwise identical
    # (scratch/nodepthab.py receipt).
    np.testing.assert_allclose(np.asarray(nc), np.asarray(tc), atol=1e-6)


@pytest.mark.slow
def test_stereo_frame_pallas_interpret_matches_xla():
    """Stereo frame (8 carried words + r^2 cutoff blend) interpret parity."""
    w, h = 64, 64
    ds = generate_visible_gaussians(120, sh_degree=0, scale_range=(0.01, 0.06))
    cam = G.make_side_by_side_stereo(G.make_camera(w, h, far=20.0), ipd=0.1)
    gi = ds.to_input()
    views = jnp.stack([jnp.asarray(cam.left.view_matrix, jnp.float32),
                       jnp.asarray(cam.right.view_matrix, jnp.float32)])
    projs = jnp.stack([jnp.asarray(cam.left.projection_matrix, jnp.float32),
                       jnp.asarray(cam.right.projection_matrix, jnp.float32)])
    centers = jnp.stack([jnp.asarray(cam.left.position, jnp.float32),
                         jnp.asarray(cam.right.position, jnp.float32)])
    st = jnp.eye(4, dtype=jnp.float32)
    kw = dict(width=w, height=h, capacity=4096, sh_degree=0,
              alpha_threshold=0.005, total_ink_threshold=2.0,
              near_plane=0.1, far_plane=20.0, input_is_srgb=False)

    out_x = depth_first_stereo_frame(gi, views, projs, centers, st,
                                     use_xla_blend=True, **kw)
    out_p = depth_first_stereo_frame(gi, views, projs, centers, st,
                                     use_xla_blend=False, interpret=True, **kw)
    np.testing.assert_allclose(np.asarray(out_p.color),
                               np.asarray(out_x.color), atol=2e-3)
