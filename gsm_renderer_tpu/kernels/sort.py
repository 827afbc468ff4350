"""Pallas multi-operand sort: in-VMEM bitonic block sort + merge-path merging.

The TPU-native replacement for the reference's multi-pass radix sorts
(DepthFirstShaders.metal:866-1696, RadixSortHelpers.h): XLA's `lax.sort` lowers
to a generic O(n log^2 n) comparator network through HBM; this kernel keeps
whole 32K-item blocks in VMEM and does all compare-exchange stages on-chip.

Primitives used (all VPU-native):
  * lane-axis compare-exchange via `take_along_axis` with static butterfly
    index patterns (the only dynamic-gather direction TPUs support),
  * sublane-axis compare-exchange via static row slicing + `where`,
  * payloads swap with the same masks as keys — no permutation materialization.

Structure:
  1. block sort: grid over blocks of BLOCK items; each block is loaded as
     (ROWS, 128), rows are bitonic-sorted along lanes, then rows are merged
     pairwise with cross-row (sublane) stages — a full bitonic sort network
     arranged so every stage is either a pure-lane or pure-sublane exchange.
  2. global merge: log2(num_blocks) passes; each pass merges pairs of sorted
     runs with merge-path partitioning (split points via XLA searchsorted on
     run boundaries), each output block = bitonic merge of one A-window and one
     reversed B-window in VMEM.

Keys are uint32 (a fused key or a (hi, lo) pair compared lexicographically by
packing into a single monotone u32 where possible; the 2-key case sorts by hi
then relies on a stable second pass -- see `sort_pairs_stable`).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = Any

LANES = 128
ROWS = 256                 # sublanes per block
BLOCK = ROWS * LANES       # 32768 items per VMEM block


def _lane_exchange(key, payloads, partner_idx, keep_low_mask):
    """One bitonic compare-exchange stage along the lane axis.

    partner_idx: (1, LANES) int32 static butterfly pattern (lane ^ k).
    keep_low_mask: (1, LANES) bool — True where this lane keeps the MIN.
    """
    idx = jnp.broadcast_to(partner_idx, key.shape)
    pkey = jnp.take_along_axis(key, idx, axis=1)
    take_self = jnp.where(keep_low_mask, key <= pkey, key >= pkey)
    new_key = jnp.where(take_self, key, pkey)
    new_payloads = []
    for p in payloads:
        pp = jnp.take_along_axis(p, idx, axis=1)
        new_payloads.append(jnp.where(take_self, p, pp))
    return new_key, new_payloads


def _sublane_exchange(key, payloads, k, keep_low_rows):
    """One compare-exchange stage along the sublane axis with distance k.

    Partner row = row ^ k; rows where (row & k) == 0 keep the MIN when
    keep_low_rows[row] else the MAX.  Implemented with pltpu.roll-free static
    slicing: rows are permuted by XOR k, which for power-of-two k is a block
    swap expressible with static slices + concat.
    """
    g = key.shape[0]
    def xor_perm(x):
        parts = []
        step = 2 * k
        for start in range(0, g, step):
            parts.append(x[start + k:start + 2 * k])
            parts.append(x[start:start + k])
        return jnp.concatenate(parts, axis=0)

    pkey = xor_perm(key)
    take_self = jnp.where(keep_low_rows, key <= pkey, key >= pkey)
    new_key = jnp.where(take_self, key, pkey)
    new_payloads = []
    for p in payloads:
        pp = xor_perm(p)
        new_payloads.append(jnp.where(take_self, p, pp))
    return new_key, new_payloads


def _row_iota():
    return jax.lax.broadcasted_iota(jnp.int32, (ROWS, 1), 0)


def _lane_iota():
    return jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)


def _bitonic_sort_block(key, payloads):
    """Full bitonic sort of a (ROWS, LANES) block in row-major item order.

    Item index = row * LANES + lane.  Stage structure: standard bitonic network
    over n = ROWS*LANES items; exchanges with distance < LANES are lane stages,
    larger distances are sublane stages (distance k*LANES -> row distance k).
    """
    lane = _lane_iota()
    row = _row_iota()
    item = row * LANES + lane  # (ROWS, LANES)

    n = ROWS * LANES
    size = 2
    while size <= n:
        asc = (item & size) == 0  # ascending segment mask (per item)
        stride = size // 2
        while stride >= 1:
            if stride >= LANES:
                k = stride // LANES
                keep_low = jnp.where((row & k) == 0, asc, ~asc)
                key, payloads = _sublane_exchange(key, payloads, k, keep_low)
            else:
                partner = lane ^ stride
                keep_low = jnp.where((lane & stride) == 0, asc, ~asc)
                key, payloads = _lane_exchange(key, payloads, partner, keep_low)
            stride //= 2
        size *= 2
    return key, payloads


def _bitonic_merge_block(key, payloads):
    """Bitonic MERGE of a (ROWS, LANES) block whose contents are bitonic
    (ascending run followed by a descending run): log2(n) stages, all ascending."""
    lane = _lane_iota()
    row = _row_iota()
    stride = (ROWS * LANES) // 2
    while stride >= 1:
        if stride >= LANES:
            k = stride // LANES
            keep_low = jnp.broadcast_to((row & k) == 0, (ROWS, LANES))
            key, payloads = _sublane_exchange(key, payloads, k, keep_low)
        else:
            partner = lane ^ stride
            keep_low = jnp.broadcast_to((lane & stride) == 0, (ROWS, LANES))
            key, payloads = _lane_exchange(key, payloads, partner, keep_low)
        stride //= 2
    return key, payloads


def _block_sort_kernel(*refs, n_payloads: int):
    key_ref = refs[0]
    payload_refs = refs[1:1 + n_payloads]
    okey_ref = refs[1 + n_payloads]
    opayload_refs = refs[2 + n_payloads:]

    key = key_ref[0]
    payloads = [p[0] for p in payload_refs]
    key, payloads = _bitonic_sort_block(key, payloads)
    okey_ref[0] = key
    for r, p in zip(opayload_refs, payloads):
        r[0] = p


def _merge_kernel(asplit_ref, bsplit_ref, key_hbm, *refs, n_payloads: int,
                  run_blocks: int):
    """Merge pass kernel: output block i of every merged pair.

    For output block i (global), the A-window [a0, a0+BLOCK) and B-window
    [b0, b0+BLOCK) (clamped, padded with sentinel) are concatenated with B
    reversed, forming a bitonic sequence of 2*BLOCK... — instead we DMA exactly
    BLOCK items: a_len from A and BLOCK - a_len from B (merge-path property:
    output block i consumes exactly BLOCK inputs).  The window is loaded,
    B-part reversed, and bitonic-merged.
    """
    payload_hbm = refs[:n_payloads]
    okey_ref = refs[n_payloads]
    opayload_refs = refs[n_payloads + 1:]

    i = pl.program_id(0)
    a0 = asplit_ref[i]
    a1 = asplit_ref[i + 1]
    b0 = bsplit_ref[i]
    # a_len + b_len == BLOCK by merge-path construction
    a_len = a1 - a0

    def body(kw, pw, sems):
        # Load A-part rows and B-part rows into one (ROWS, LANES) buffer.
        # A occupies items [0, a_len), B occupies [a_len, BLOCK) -- but DMA
        # granularity is rows, so we load them via two row-aligned copies into
        # scratch and shift with a lane/sublane select... Simpler and still
        # fast: load ROWS rows from A starting at a0 row-aligned and ROWS rows
        # from B, then select per item.  (two full windows in VMEM)
        pass

    # NOTE: implemented in the wrapper via XLA dynamic slices for v1 (the
    # windows are contiguous); the kernel only does the in-VMEM merge.
    raise NotImplementedError


def sort_block_pallas(key, payloads, *, interpret: bool = False):
    """Sort (C,) arrays in independent BLOCK-sized chunks (C % BLOCK == 0).

    Returns block-sorted (key, payloads) — input to the merge passes.
    """
    c = key.shape[0]
    assert c % BLOCK == 0
    nb = c // BLOCK
    n_payloads = len(payloads)

    def reshape(x):
        return x.reshape(nb, ROWS, LANES)

    ins = [reshape(key)] + [reshape(p) for p in payloads]
    spec = pl.BlockSpec((1, ROWS, LANES), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_block_sort_kernel, n_payloads=n_payloads),
        out_shape=tuple(jax.ShapeDtypeStruct((nb, ROWS, LANES), x.dtype)
                        for x in ins),
        grid_spec=pl.GridSpec(grid=(nb,), in_specs=[spec] * len(ins),
                              out_specs=tuple([spec] * len(ins))),
        interpret=interpret,
    )(*ins)
    return outs[0].reshape(c), [o.reshape(c) for o in outs[1:]]


def _merge_block_pallas(key, payloads, *, interpret: bool = False):
    """Bitonic-MERGE each BLOCK chunk (contents must be bitonic)."""
    c = key.shape[0]
    nb = c // BLOCK
    n_payloads = len(payloads)

    def kernel(*refs):
        key_ref = refs[0]
        payload_refs = refs[1:1 + n_payloads]
        okey_ref = refs[1 + n_payloads]
        opayload_refs = refs[2 + n_payloads:]
        k = key_ref[0]
        ps = [p[0] for p in payload_refs]
        k, ps = _bitonic_merge_block(k, ps)
        okey_ref[0] = k
        for r, p in zip(opayload_refs, ps):
            r[0] = p

    def reshape(x):
        return x.reshape(nb, ROWS, LANES)

    ins = [reshape(key)] + [reshape(p) for p in payloads]
    spec = pl.BlockSpec((1, ROWS, LANES), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        out_shape=tuple(jax.ShapeDtypeStruct((nb, ROWS, LANES), x.dtype)
                        for x in ins),
        grid_spec=pl.GridSpec(grid=(nb,), in_specs=[spec] * len(ins),
                              out_specs=tuple([spec] * len(ins))),
        interpret=interpret,
    )(*ins)
    return outs[0].reshape(c), [o.reshape(c) for o in outs[1:]]


def sort_pallas(key, payloads, *, interpret: bool = False):
    """Full sort of (C,) uint32 key + payloads, C a multiple of BLOCK.

    Phase 1: Pallas in-VMEM block sorts.
    Phase 2: merge-path global merging — split points from XLA searchsorted,
    window assembly via XLA dynamic slicing (contiguous), in-VMEM bitonic merge
    per output block in Pallas.

    NOT stable (bitonic networks are not); callers needing stability must make
    keys unique (e.g. append low-order index bits).
    """
    c = key.shape[0]
    assert c % BLOCK == 0
    nb = c // BLOCK
    key, payloads = sort_block_pallas(key, payloads, interpret=interpret)

    run = BLOCK
    while run < c:
        n_pairs = c // (2 * run)
        blocks_per_pair = (2 * run) // BLOCK
        # merge-path split points for every output block of every pair
        starts = []
        a_list = []
        # Build split points with one vectorized searchsorted per pass:
        # For pair p, output block j (global item offset o = j*BLOCK within the
        # pair): a_take = #items from A = partition index via binary search on
        # merged rank: a_take = argmin_k ( A[k] > B[o-k-1] ) -- computed via
        # searchsorted on the diagonal.  We vectorize using jnp.searchsorted
        # over each pair's A and B runs with a fori; nb is small (<= 256).
        key, payloads = _merge_pass(key, payloads, run, interpret=interpret)
        run *= 2
    return key, payloads


def _merge_pass(key, payloads, run, *, interpret: bool = False):
    """One global merge pass: merge adjacent sorted runs of length `run`."""
    c = key.shape[0]
    n_pairs = c // (2 * run)
    kp = key.reshape(n_pairs, 2, run)
    a_keys = kp[:, 0, :]
    b_keys = kp[:, 1, :]

    out_blocks = (2 * run) // BLOCK

    # Merge-path split: for output offset o in the pair, take a_cnt(o) items
    # from A where a_cnt(o) = #{k < run : A[k] <= merged rank o}.  The standard
    # diagonal search: a_cnt = searchsorted-like balance point satisfying
    # A[a-1] <= B[o-a] (stability toward A).  Vectorized binary search:
    offs = jnp.arange(out_blocks, dtype=jnp.int32) * BLOCK  # (OB,)

    def split_for_pair(a, b):
        def one(o):
            lo, hi = jnp.maximum(o - run, 0), jnp.minimum(o, run)
            def body(_, lh):
                lo, hi = lh
                mid = (lo + hi) // 2
                a_val = a[jnp.clip(mid, 0, run - 1)]
                b_val = b[jnp.clip(o - mid - 1, 0, run - 1)]
                # take from A while A[mid] <= B[o-mid-1]
                cond = jnp.where(mid >= run, False,
                                 jnp.where(o - mid - 1 < 0, True,
                                           a_val <= b_val))
                return jnp.where(cond, mid + 1, lo), jnp.where(cond, hi, mid)
            lo, hi = jax.lax.fori_loop(0, 18, body, (lo, hi))
            return lo
        return jax.vmap(one)(offs)

    a_splits = jax.vmap(split_for_pair)(a_keys, b_keys)  # (n_pairs, OB)
    a_splits = jnp.concatenate(
        [a_splits, jnp.full((n_pairs, 1), run, jnp.int32)], axis=1)
    b_splits = offs[None, :] - a_splits[:, :-1]
    b_splits = jnp.concatenate(
        [b_splits, jnp.full((n_pairs, 1), run, jnp.int32)], axis=1)

    # Window assembly in XLA: for each output block, gather its A-part and
    # B-part into a BLOCK-item buffer: A items ascending then B items
    # *reversed* => bitonic.  Using take-with-clamp keeps everything vectorized.
    item = jnp.arange(BLOCK, dtype=jnp.int32)

    def assemble(pair_arrs, a_sp, b_sp):
        a, b = pair_arrs

        def one_block(j):
            a0, a1 = a_sp[j], a_sp[j + 1]
            b0, b1 = b_sp[j], b_sp[j + 1]
            a_len = a1 - a0
            b_len = b1 - b0
            # positions [0, a_len) from A ascending; [a_len, BLOCK) from B
            # reversed (b1-1 down to b0)
            from_a = item < a_len
            a_idx = jnp.clip(a0 + item, 0, run - 1)
            b_idx = jnp.clip(b1 - 1 - (item - a_len), 0, run - 1)
            av = a[a_idx]
            bv = b[b_idx]
            # pad: if a_len + b_len < BLOCK (never happens except last ragged
            # case, which cannot occur since run sizes are powers of two)
            return jnp.where(from_a, av, bv)

        return jax.vmap(one_block)(jnp.arange(out_blocks))

    merged_key = jax.vmap(lambda a, b, asp, bsp: assemble((a, b), asp, bsp))(
        a_keys, b_keys, a_splits, b_splits)          # (n_pairs, OB, BLOCK)
    merged_payloads = []
    for p in payloads:
        pp = p.reshape(n_pairs, 2, run)
        mp = jax.vmap(lambda a, b, asp, bsp: assemble((a, b), asp, bsp))(
            pp[:, 0, :], pp[:, 1, :], a_splits, b_splits)
        merged_payloads.append(mp.reshape(c))

    key_flat = merged_key.reshape(c)
    key_out, payloads_out = _merge_block_pallas(key_flat, merged_payloads,
                                                interpret=interpret)
    return key_out, payloads_out
