"""Kernel-scale tests mirroring the reference's standalone GPU sort tests
(DepthFirstUnitTests.swift:308-468 drives the depth radix sort at 1M keys;
GlobalUnitTests.swift:107-178 the global sort at 50k).

The TPU build's sort primitive is ``lax.sort``; what must hold at scale is
exactly what the reference asserts of its radix kernels: full sortedness and
STABILITY (stability is the correctness linchpin of the DepthFirst tile sort).
A gated real-chip variant (GSM_TPU_TESTS=1) exercises the production Pallas
expand at the same scale.
"""

import os

import numpy as np
import pytest


def test_two_key_sort_1m_stability():
    """1M instances, (tile, depth) two-key sort: sorted by tile, by depth
    within tile, and ties preserve input order (the stable-tile-sort
    property)."""
    import jax
    import jax.numpy as jnp

    n = 1_000_000
    rng = np.random.default_rng(42)
    # few tiles + quantized depths => massive tie runs exercise stability
    tile = rng.integers(0, 64, n, dtype=np.uint32)
    depth = rng.integers(0, 256, n, dtype=np.uint32)
    idx = np.arange(n, dtype=np.uint32)

    st, sd, si = jax.jit(
        lambda a, b, c: jax.lax.sort((a, b, c), num_keys=2))(
            jnp.asarray(tile), jnp.asarray(depth), jnp.asarray(idx))
    st, sd, si = np.asarray(st), np.asarray(sd), np.asarray(si)

    assert (np.diff(st.astype(np.int64)) >= 0).all()
    same_tile = st[1:] == st[:-1]
    assert (sd[1:][same_tile] >= sd[:-1][same_tile]).all()
    same_both = same_tile & (sd[1:] == sd[:-1])
    # stability: input order preserved within equal (tile, depth)
    assert (si[1:][same_both] > si[:-1][same_both]).all()

    # element-exact agreement with the NumPy oracle (reference asserts exact
    # payload order, GlobalUnitTests.swift:23-105)
    order = np.lexsort((idx, depth, tile))
    np.testing.assert_array_equal(si, idx[order])


def test_expand_xla_1m_slots():
    """Instance expansion at ~1M slots: every slot's (rank, j) decomposition
    and closed-form tile id match the NumPy oracle."""
    import jax.numpy as jnp

    from gsm_renderer_tpu.kernels import expand as E
    from gsm_renderer_tpu.ops.binning import pack_rect_word

    n = 300_000
    cap = 2_097_152
    rng = np.random.default_rng(3)
    counts = rng.integers(1, 6, n).astype(np.int32)
    min_tx = rng.integers(0, 100, n).astype(np.int32)
    min_ty = rng.integers(0, 60, n).astype(np.int32)
    rect_w = rng.integers(1, 6, n).astype(np.int32)
    # counts must be <= rect area for a sane scene; here counts enumerate the
    # full rect like the pipeline does: count = rect_w * rect_h
    rect_h = np.maximum(counts // rect_w, 1)
    counts = (rect_w * rect_h).astype(np.int32)

    rect = pack_rect_word(jnp.asarray(min_tx), jnp.asarray(min_ty),
                          jnp.asarray(rect_w))
    aux = jnp.zeros((n, 1), jnp.uint32)
    key, _a0, total, ovf = E.expand_slots_xla(
        jnp.asarray(counts), rect, aux, capacity=cap, tiles_x=128)
    key = np.asarray(key)
    total = int(total)
    assert total == counts.sum() and int(ovf) == 0

    # NumPy oracle tile ids
    rank = np.repeat(np.arange(n), counts)
    off = np.concatenate([[0], np.cumsum(counts)])[:-1]
    j = np.arange(total) - off[rank]
    ty = min_ty[rank] + j // rect_w[rank]
    tx = min_tx[rank] + j % rect_w[rank]
    want = (ty * 128 + tx).astype(np.uint32)
    np.testing.assert_array_equal(key[:total], want)
    assert (key[total:] == 0xFFFFFFFF).all()


@pytest.mark.skipif(not os.environ.get("GSM_TPU_TESTS"),
                    reason="real-chip scale test (set GSM_TPU_TESTS=1)")
def test_render_6m_gaussians_real_chip():
    """Reference default-config scale (RendererConfig 6M gaussians,
    GaussianRendererProtocol.swift:195-228; hard cap 30M,
    DepthFirstRenderer.swift:7): a full 6M-gaussian frame must fit memory at
    the 4x capacity model, render finite output, and keep overflow=0; the
    adaptive second frame must agree."""
    import gsm_renderer_tpu as G
    from gsm_renderer_tpu.io.scene import generate_visible_gaussians

    n = 6_000_000
    ds = generate_visible_gaussians(n, sh_degree=0, scale_range=(0.001, 0.006))
    cam = G.make_camera(1920, 1080, far=50.0)
    r = G.DepthFirstRenderer(G.RendererConfig(sh_degree=0))
    gi = ds.to_input()
    o1 = r.render(gi, cam, 1920, 1080)       # full 4x model (24M slots)
    c1 = np.asarray(o1.color)
    assert np.isfinite(c1).all()
    assert int(o1.header.overflow) == 0
    assert int(o1.header.visible_count) > n // 2
    o2 = r.render(gi, cam, 1920, 1080)       # adaptive capacity
    assert int(o2.header.overflow) == 0
    np.testing.assert_array_equal(c1, np.asarray(o2.color))


@pytest.mark.skipif(not os.environ.get("GSM_TPU_TESTS"),
                    reason="real-chip scale test (set GSM_TPU_TESTS=1)")
def test_expand_pallas_1m_real_chip():
    """Production Pallas expand at 1M+ slots on the real TPU vs the XLA
    mirror (the reference's testDepthSortAtScale analogue)."""
    import jax.numpy as jnp

    from gsm_renderer_tpu.kernels import expand as E
    from gsm_renderer_tpu.ops.binning import pack_rect_word

    n = 300_000
    cap = 2_097_152
    rng = np.random.default_rng(5)
    rect_w = rng.integers(1, 6, n).astype(np.int32)
    rect_h = rng.integers(1, 6, n).astype(np.int32)
    counts = (rect_w * rect_h).astype(np.int32)
    min_tx = rng.integers(0, 100, n).astype(np.int32)
    min_ty = rng.integers(0, 60, n).astype(np.int32)

    rect = pack_rect_word(jnp.asarray(min_tx), jnp.asarray(min_ty),
                          jnp.asarray(rect_w))
    aux = jnp.asarray(rng.integers(0, 2**32, (n, 1), dtype=np.uint32))
    args = (jnp.asarray(counts), rect, aux)
    kw = dict(capacity=cap, tiles_x=128)
    got = E.expand_slots_pallas(*args, **kw)
    want = E.expand_slots_xla(*args, **kw)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
