"""Unit tests for the expansion/binning ops vs NumPy references."""

import numpy as np
import jax.numpy as jnp

from gsm_renderer_tpu.ops import binning as B


def np_slot_map(counts, capacity):
    """Reference inverse slot map."""
    rank = np.full(capacity, -1, np.int64)
    j = np.zeros(capacity, np.int64)
    s = 0
    for g, c in enumerate(counts):
        for k in range(c):
            if s < capacity:
                rank[s] = g
                j[s] = k
            s += 1
    return rank, j, min(s, capacity), int(np.sum(counts))


def test_build_slot_map_basic(rng):
    counts = rng.integers(0, 6, 50).astype(np.int32)
    cap = 256
    sm = B.build_slot_map(jnp.asarray(counts), cap)
    rank_ref, j_ref, _, total_ref = np_slot_map(counts, cap)
    total = int(sm.total)
    assert total == total_ref
    rank = np.asarray(sm.rank)
    j = np.asarray(sm.j)
    valid = np.asarray(sm.slot_valid)
    np.testing.assert_array_equal(rank[:total], rank_ref[:total])
    np.testing.assert_array_equal(j[:total], j_ref[:total])
    assert valid[:total].all()
    assert not valid[total:].any()


def test_build_slot_map_overflow(rng):
    counts = np.full(100, 10, np.int32)
    cap = 512  # < 1000 total
    sm = B.build_slot_map(jnp.asarray(counts), cap)
    assert int(sm.overflow) == 1
    rank_ref, j_ref, _, _ = np_slot_map(counts, cap)
    np.testing.assert_array_equal(np.asarray(sm.rank), rank_ref)
    np.testing.assert_array_equal(np.asarray(sm.j), j_ref)


def test_build_slot_map_empty():
    sm = B.build_slot_map(jnp.zeros(16, jnp.int32), 64)
    assert int(sm.total) == 0
    assert not np.asarray(sm.slot_valid).any()


def test_build_slot_map_leading_zeros():
    counts = np.array([0, 0, 3, 0, 2], np.int32)
    sm = B.build_slot_map(jnp.asarray(counts), 16)
    rank = np.asarray(sm.rank)
    j = np.asarray(sm.j)
    np.testing.assert_array_equal(rank[:5], [2, 2, 2, 4, 4])
    np.testing.assert_array_equal(j[:5], [0, 1, 2, 0, 1])


def test_slot_tile_ids(rng):
    # 3 gaussians with known rects on a 10x8 tile grid
    tiles_x = 10
    min_tx = np.array([1, 5, 0], np.int32)
    min_ty = np.array([2, 0, 7], np.int32)
    rect_w = np.array([3, 1, 2], np.int32)
    rect_h = np.array([2, 4, 1], np.int32)
    counts = rect_w * rect_h
    word = B.pack_rect_word(jnp.asarray(min_tx), jnp.asarray(min_ty),
                            jnp.asarray(rect_w))
    sm = B.build_slot_map(jnp.asarray(counts), 32)
    tiles = np.asarray(B.slot_tile_ids(sm, word, tiles_x))

    expect = []
    for g in range(3):
        for jj in range(counts[g]):
            ty = min_ty[g] + jj // rect_w[g]
            tx = min_tx[g] + jj % rect_w[g]
            expect.append(ty * tiles_x + tx)
    total = int(sm.total)
    np.testing.assert_array_equal(tiles[:total], expect)
    assert (tiles[total:] == 0xFFFFFFFF).all()


def test_stable_sort_preserves_depth_order(rng):
    # emission order = depth order; stability must keep it within a tile
    n = 5000
    tiles = rng.integers(0, 37, n).astype(np.uint32)
    payload = np.arange(n, dtype=np.int32)
    sk, sp = B.stable_sort_by_tile(jnp.asarray(tiles), jnp.asarray(payload))
    sk, sp = np.asarray(sk), np.asarray(sp)
    assert (np.diff(sk.astype(np.int64)) >= 0).all()
    for t in range(37):
        sel = sp[sk == t]
        assert (np.diff(sel) > 0).all()  # ascending rank = depth order preserved


def test_extract_tile_ranges(rng):
    n, num_tiles = 4096, 64
    tiles = np.sort(rng.integers(0, num_tiles, n)).astype(np.uint32)
    # sprinkle sentinels at the end
    tiles = np.concatenate([tiles, np.full(100, 0xFFFFFFFF, np.uint32)])
    starts, counts = map(np.asarray, B.extract_tile_ranges(jnp.asarray(tiles),
                                                          num_tiles))
    for t in range(num_tiles):
        sel = np.nonzero(tiles == t)[0]
        if sel.size:
            assert starts[t] == sel[0]
            assert counts[t] == sel.size
        else:
            assert counts[t] == 0
    assert counts.sum() == n  # sentinels excluded


def test_rect_word_roundtrip(rng):
    tx = rng.integers(0, 1024, 100)
    ty = rng.integers(0, 1024, 100)
    w = rng.integers(1, 1024, 100)
    word = B.pack_rect_word(jnp.asarray(tx), jnp.asarray(ty), jnp.asarray(w))
    a, b, c = map(np.asarray, B.unpack_rect_word(word))
    np.testing.assert_array_equal(a, tx)
    np.testing.assert_array_equal(b, ty)
    np.testing.assert_array_equal(c, w)
