"""Instance expansion, sorting and tile-range extraction.

TPU-native replacement for the reference's scatter/sort middle stages:

* visibility compaction + depth radix sort      (DepthFirstShaders.metal:516-621, 1387-1696)
* instance-offset prefix sum + createInstances  (DepthFirstShaders.metal:642-788, 2036-2139)
* stable tile radix sort                        (DepthFirstShaders.metal:866-1256)
* tile range extraction                         (DepthFirstShaders.metal:1258-1369)

Design (idiomatic TPU, not a port): TPUs abhor scatter, so instead of the
reference's "each gaussian sequentially writes its (tile, idx) pairs at its prefix
offset", we build the *inverse* mapping slot -> (gaussian rank, within-rect index)
with two tiny scatters and two cumulative ops:

  1. counts are the full clamped tile-rect sizes (closed form, no loops);
  2. ``offsets = exclusive_cumsum(counts)`` over gaussians (in depth order for the
     DepthFirst pipeline, in input order for the Global pipeline);
  3. scatter a mark at each gaussian's offset into the slot axis; a cumulative sum
     then yields ``rank(s)`` (which gaussian owns slot s) and a cumulative max of
     scattered offsets yields ``j(s) = s - offset[rank(s)]`` — all O(C) vector work;
  4. the slot's tile is closed-form from the rect geometry: no per-tile loops, no
     atomics, no indirect dispatch;
  5. one stable ``lax.sort`` by tile key then replaces the whole multi-pass radix
     pipeline (stability preserves depth order within a tile — the correctness
     property the reference builds its stable tile sort around).

The FlashGS-style exact ellipse/tile test is applied *after* the sort as a
zero-alpha mask on the gathered blend table (reference applies it before instance
creation — the rendered output is identical because excluded instances contribute
exactly zero; only the instance-list occupancy differs).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

Array = Any

# Sentinel tile key for dead slots (sorts after every real tile).
# NOTE: a plain Python int, NOT jnp.uint32(...) — module-level jnp arrays become
# device-committed closure constants, and jax 0.9.0's constant-argument dispatch
# drops them on CPU once several programs coexist ("Execution supplied 8 buffers
# but compiled program expected 9"/10).  Ints fold into the trace as literals.
SENTINEL_KEY = 0xFFFFFFFF


def _sortable_u32(x: float) -> int:
    """Static-float version of mathlib.float_to_sortable_uint."""
    import numpy as np

    bits = int(np.float32(x).view(np.uint32))
    return bits ^ (0xFFFFFFFF if bits & 0x80000000 else 0x80000000)


@dataclasses.dataclass(frozen=True)
class KeyPlan:
    """Tie-free fused sort-key layout for the instance (tile, depth) sort.

    The reference's stable tile radix sort orders equal (tile, depth) pairs by
    gaussian input index (stable depth sort then stable tile sort,
    DepthFirstShaders.metal:866-1256).  A stable ``lax.sort`` reproduces that
    but XLA's stability machinery costs ~7% of the headline frame (measured:
    25.1-26.5 vs 23.4-23.6 ms in-frame; scratch/stabframe.py).  Instead we
    make ties IMPOSSIBLE and sort unstably with bit-identical order:

      key1 = [tile : tile_bits | depth_hi : d_hi]
      key2 = [depth_lo : d_lo  | gaussian_index : idx_bits]

    with depth normalized to ``sortable(depth) - near_key`` (order-preserving;
    live depths lie in [near, far] so the span needs only ~27 bits for
    0.1..50, not 32).  Each gaussian emits at most one instance per tile, so
    (tile, gaussian_index) is unique -> the key pair is unique -> an unstable
    sort is deterministic AND reproduces the reference tie order exactly.
    Fits whenever tile_bits + span_bits + idx_bits <= 64 (every shipped
    config; ``make_key_plan`` returns None otherwise and callers fall back to
    the stable sort).
    """

    d_hi: int       # depth bits carried in key1 (= 32 - tile_bits)
    d_lo: int       # depth bits carried in key2's high field
    idx_bits: int   # gaussian-index bits in key2's low field
    near_key: int   # sortable-uint depth normalization offset
    span: int       # max normalized depth value (clamp bound)

    @property
    def kernel_tuple(self):
        return (self.d_hi, self.d_lo, self.idx_bits)

    def normalize(self, depth_word):
        """Order-preserving depth-word normalization (saturating at the
        bounds; projection culls to [near, far] so live keys never clamp)."""
        d = depth_word.astype(jnp.uint32)
        nk = jnp.uint32(self.near_key)
        return jnp.minimum(jnp.maximum(d, nk) - nk, jnp.uint32(self.span))


def make_key_plan(num_tiles: int, n_gaussians: int, *,
                  near_plane: float | None = None,
                  far_plane: float | None = None,
                  depth_span_bits: int | None = None) -> KeyPlan | None:
    """Build a tie-free :class:`KeyPlan`, or None if the bit budget (64)
    cannot hold tile + depth-span + gaussian-index bits.

    Depth bounds are widened to [near/4, far*4]: the sortable-uint span is
    log-like in the value, so the guard octaves cost well under one bit while
    absorbing any boundary wobble of the cull predicates.
    """
    if depth_span_bits is not None:
        near_key, span = 0, (1 << depth_span_bits) - 1
    else:
        near_key = _sortable_u32(max(near_plane, 1e-6) * 0.25)
        far_key = _sortable_u32(far_plane * 4.0)
        span = far_key - near_key
        if span <= 0:
            return None
    tile_bits = max(int(num_tiles).bit_length(), 1)
    idx_bits = max(int(n_gaussians - 1).bit_length(), 1)
    d_hi = 32 - tile_bits
    d_lo = max(int(span).bit_length() - d_hi, 0)
    if d_hi <= 0 or d_lo + idx_bits > 32:
        return None
    return KeyPlan(d_hi=d_hi, d_lo=d_lo, idx_bits=idx_bits,
                   near_key=near_key, span=span)


def pack_rect_word(min_tx, min_ty, rect_w):
    """Pack (min_tx, min_ty, rect_w) into one uint32 (10 | 10 | 10 bits).

    Supports tile grids up to 1024x1024 and rect widths up to 1023 (the clamped
    rect width is bounded by the tile-grid width).
    """
    return (
        min_tx.astype(jnp.uint32)
        | (min_ty.astype(jnp.uint32) << 10)
        | (rect_w.astype(jnp.uint32) << 20)
    )


def unpack_rect_word(word):
    min_tx = (word & jnp.uint32(0x3FF)).astype(jnp.int32)
    min_ty = ((word >> 10) & jnp.uint32(0x3FF)).astype(jnp.int32)
    rect_w = ((word >> 20) & jnp.uint32(0x3FF)).astype(jnp.int32)
    return min_tx, min_ty, rect_w


def depth_order(depth_key):
    """Stable depth sort of gaussians; culled keys (0xFFFFFFFF) sink to the end.

    Returns (sorted_key, order) where ``order[i]`` is the gaussian index at depth
    rank i.  Equivalent of visibility compaction + depth radix sort
    (DepthFirstShaders.metal:516-621, 1387-1696) in one stable sort.
    """
    n = depth_key.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    sorted_key, order = jax.lax.sort((depth_key, iota), num_keys=1)
    return sorted_key, order


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SlotMap:
    """Inverse expansion mapping over the static instance capacity C."""

    rank: Array        # (C,) int32 — owning gaussian rank; -1 for dead slots
    j: Array           # (C,) int32 — within-rect index (row-major)
    slot_valid: Array  # (C,) bool  — slot < total emitted instances
    total: Array       # () int32   — total instances (pre-clamp)
    overflow: Array    # () int32   — 1 if total exceeded capacity


def build_slot_map(counts, capacity: int) -> SlotMap:
    """Invert per-gaussian instance counts into per-slot (rank, j).

    ``counts``: (N,) int32 instance counts in emission order (depth order for the
    DepthFirst pipeline).  ``capacity``: static slot count C.

    Replaces the reference's prefix-sum + sequential per-gaussian writes
    (InstanceExpansionEncoder.swift:83-249) with scatter-free closed forms:
    two 1-element-per-gaussian scatters plus a cumulative sum / max over C.
    """
    counts = counts.astype(jnp.int32)
    offsets = jnp.cumsum(counts) - counts  # exclusive
    total = offsets[-1] + counts[-1]
    overflow = (total > capacity).astype(jnp.int32)

    n = counts.shape[0]
    has = counts > 0
    # ONE scatter (scatters are the expensive primitive on TPU): drop
    # out-of-range updates via an OOB index + mode="drop".
    offs_valid = jnp.where(has & (offsets < capacity), offsets, capacity)
    dense_idx = jnp.arange(n, dtype=jnp.int32)
    rank_at = jnp.zeros((capacity,), jnp.int32)
    rank_at = rank_at.at[offs_valid].max(dense_idx, mode="drop")
    rank = jax.lax.cummax(rank_at)

    # within-rect index: j = slot - offset[rank]  (gather instead of a second
    # scatter+cummax — gathers are several times cheaper)
    off_run = offsets[rank]
    slot_iota = jnp.arange(capacity, dtype=jnp.int32)
    j = slot_iota - off_run
    slot_valid = slot_iota < total
    # rank/j are kept unmasked past ``total`` so that rank stays nondecreasing
    # (the Pallas expand kernel relies on monotone slot->gaussian windows);
    # consumers must mask with ``slot_valid``.
    return SlotMap(rank=rank, j=j, slot_valid=slot_valid, total=total,
                   overflow=overflow)


def slot_tile_ids(slot_map: SlotMap, rect_word_by_rank, tiles_x: int):
    """Closed-form tile id per slot.

    ``rect_word_by_rank``: (N,) uint32 packed rects aligned with the emission
    order used for ``counts``.  Returns (C,) uint32 tile keys with dead slots at
    SENTINEL_KEY.  Equivalent of ``createInstancesKernel`` writing (tileId, idx)
    pairs (DepthFirstShaders.metal:642-788), minus the per-tile test (applied
    later as a zero-alpha mask).
    """
    safe_rank = jnp.maximum(slot_map.rank, 0)
    word = rect_word_by_rank[safe_rank]
    min_tx, min_ty, rect_w = unpack_rect_word(word)
    rw = jnp.maximum(rect_w, 1)
    # Integer division by a dynamic divisor is very slow on the TPU VPU;
    # use the float-reciprocal trick with an exact correction step.
    # j < 2^20 and rw < 2^10 are exact in float32.
    jf = slot_map.j.astype(jnp.float32)
    q = jnp.floor(jf * (1.0 / rw.astype(jnp.float32))).astype(jnp.int32)
    r = slot_map.j - q * rw
    # correct off-by-one from reciprocal rounding
    q = jnp.where(r < 0, q - 1, jnp.where(r >= rw, q + 1, q))
    r = slot_map.j - q * rw
    ty = min_ty + q
    tx = min_tx + r
    tile = (ty * tiles_x + tx).astype(jnp.uint32)
    return jnp.where(slot_map.slot_valid, tile, jnp.uint32(SENTINEL_KEY))


def stable_sort_by_tile(tile_key, payload):
    """Stable sort of instances by tile key; stability preserves emission (depth)
    order within each tile — the linchpin correctness property of the reference's
    stable tile radix sort (DepthFirstShaders.metal:866-1256)."""
    return jax.lax.sort((tile_key, payload), num_keys=1)


def extract_tile_ranges(sorted_tile_key, num_tiles: int):
    """Per-tile (offset, count) headers via vectorized binary search.

    Equivalent of ``extractTileRangesKernel`` (DepthFirstShaders.metal:1258-1369),
    which also binary-searches the sorted keys per tile.
    """
    # integer keys: end(t) == start(t+1) (nothing sorts strictly between t and
    # t+1; keys >= num_tiles are sentinels), so ONE search over num_tiles+1
    # query points yields both bounds.  method="scan_unrolled": the default
    # 22-iteration while loop pays per-step dispatch (~3.1 ms at 3.0M keys /
    # 8161 queries on-chip); unrolling the static binary search is 1.0-1.3 ms
    # for identical results.
    #
    # MEASURED AND REJECTED (scratch/rangesab.py, round 4): a k-ary search
    # (fanout 8/16/32 — fewer dependent levels, wider per-level (8161, F-1)
    # gathers) is bitexact but 2-6x SLOWER standalone (old 1.3-1.7 ms vs k8
    # 2.8-3.7, k16 4.9-5.0, k32 8.5): XLA:TPU gathers price per gathered
    # ELEMENT (~40 ns), so widening the probes costs far more than the
    # shortened chain saves.  The binary search's 22 x 8161 1-D gathers stay.
    tiles = jnp.arange(num_tiles + 1, dtype=jnp.uint32)
    bounds = jnp.searchsorted(sorted_tile_key, tiles, side="left",
                              method="scan_unrolled").astype(jnp.int32)
    return bounds[:-1], bounds[1:] - bounds[:-1]


def gather_sorted_records(sorted_payload, record_words):
    """Gather quantized record words into sorted-instance order.

    ``sorted_payload``: (C,) int32 indices into the emission-order table;
    ``record_words``: (N, K) uint32 packed record words.  One row-gather — the
    equivalent of the reference's reorder-into-sorted-order pass
    (HardwareGaussianShaders.metal:348-363).
    """
    return record_words[jnp.maximum(sorted_payload, 0)]
