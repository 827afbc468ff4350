"""Pallas instance-expansion kernel.

Replaces the XLA gather-bound middle of the pipeline (per-slot gaussian lookup
and tile-id computation — the equivalent of ``createInstancesKernel``,
DepthFirstShaders.metal:642-788) with windowed VMEM gathers:

Slots are emitted in gaussian order with every gaussian owning >= 1 slot, so the
owning-gaussian index is nondecreasing along the slot axis and a block of BLK
slots references a *contiguous window* of at most BLK+1 gaussians.  Each grid
step DMAs that window of the per-gaussian tables into VMEM and resolves the
per-slot values with masked ``take_along_axis`` lane gathers — O(window_rows)
vector ops instead of XLA's elementwise HBM gathers (which cost ~10 ns/element
and dominated the frame at ~100 ms).

Outputs per slot: the tile key (closed-form j -> tile with float-reciprocal
division, sentinel for dead/culled slots) and K carried auxiliary words (depth
key + packed render record) ready to ride through the radix sort as payload.
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
BLK_SUB = 32                  # sublanes per slot block
BLK = BLK_SUB * LANES         # 4096 slots per grid step
WIN_ROWS = BLK_SUB + 2        # gaussian window rows (BLK+1 gaussians + misalign)

# Plain Python ints (module-level jnp arrays become device-committed closure
# constants that trip jax 0.9.0's constant-argument dispatch on CPU).
SENTINEL = 0xFFFFFFFF
# rect_word bit 30 marks a culled gaussian (its single slot gets the sentinel)
CULLED_BIT = 1 << 30


def _windowed_gather(win, widx, wlane):
    """Gather win[widx, wlane] where ``win`` is (WIN_ROWS, 128) i32 in VMEM and
    ``widx``/``wlane`` are (BLK_SUB, 128) i32 with widx < WIN_ROWS.

    Implemented as WIN_ROWS masked lane-gathers (cross-row dynamic indexing is
    not available on the VPU; lane-wise ``take_along_axis`` is).
    """
    out = jnp.zeros(widx.shape, jnp.int32)
    for k in range(WIN_ROWS):
        row = jnp.broadcast_to(win[k:k + 1, :], widx.shape)  # (BLK_SUB, 128)
        vals = jnp.take_along_axis(row, wlane, axis=1)
        out = jnp.where(widx == k, vals, out)
    return out


def _expand_kernel(r0_ref, total_ref, rank_ref, j_ref, rect_hbm, aux_hbm,
                   *out_refs, tiles_x: int, n_aux: int, fused_depth16: bool):
    i = pl.program_id(0)
    r0 = r0_ref[i]
    row0 = r0 // LANES

    def body(rect_win, aux_win, sem0, sem1):
        cp0 = pltpu.make_async_copy(rect_hbm.at[pl.ds(row0, WIN_ROWS)],
                                    rect_win, sem0)
        cp0.start()
        cp1 = pltpu.make_async_copy(aux_hbm.at[pl.ds(row0, WIN_ROWS)],
                                    aux_win, sem1)
        cp1.start()
        cp0.wait()
        cp1.wait()

        rank = rank_ref[0]                        # (BLK_SUB, 128) i32
        jj = j_ref[0]
        local = rank - row0 * LANES
        widx = local >> 7
        wlane = local & 127

        rect = _windowed_gather(rect_win, widx, wlane)
        rect_u = pltpu.bitcast(rect, jnp.uint32)
        min_tx = (rect_u & jnp.uint32(0x3FF)).astype(jnp.int32)
        min_ty = ((rect_u >> 10) & jnp.uint32(0x3FF)).astype(jnp.int32)
        rect_w = ((rect_u >> 20) & jnp.uint32(0x3FF)).astype(jnp.int32)
        culled = (rect_u & jnp.uint32(CULLED_BIT)) != 0

        rw = jnp.maximum(rect_w, 1)
        jf = jj.astype(jnp.float32)
        q = jnp.floor(jf * (1.0 / rw.astype(jnp.float32))).astype(jnp.int32)
        r = jj - q * rw
        q = jnp.where(r < 0, q - 1, jnp.where(r >= rw, q + 1, q))
        r = jj - q * rw
        tile = ((min_ty + q) * tiles_x + min_tx + r).astype(jnp.uint32)

        aux_vals = []
        for a in range(n_aux):
            v = _windowed_gather(aux_win[:, a, :], widx, wlane)
            aux_vals.append(pltpu.bitcast(v, jnp.uint32))

        slot0 = i * BLK
        sub_iota = jax.lax.broadcasted_iota(jnp.int32, (BLK_SUB, LANES), 0)
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (BLK_SUB, LANES), 1)
        slot = slot0 + sub_iota * LANES + lane_iota
        dead = jnp.logical_or(slot >= total_ref[0], culled)

        if fused_depth16:
            # Global/Local: key = [tile:16 | depth16:16]; aux word 0 carries
            # the 16-bit half depth key (GlobalShaders.metal:266-300)
            key = (tile << 16) | (aux_vals[0] & jnp.uint32(0xFFFF))
        else:
            key = tile
        key = jnp.where(dead, jnp.uint32(SENTINEL), key)

        out_refs[0][0] = key
        for a in range(n_aux):
            out_refs[1 + a][0] = jnp.where(dead, jnp.uint32(0), aux_vals[a])

    pl.run_scoped(
        body,
        rect_win=pltpu.VMEM((WIN_ROWS, LANES), jnp.int32),
        aux_win=pltpu.VMEM((WIN_ROWS, n_aux, LANES), jnp.int32),
        sem0=pltpu.SemaphoreType.DMA,
        sem1=pltpu.SemaphoreType.DMA,
    )


@functools.partial(jax.jit, static_argnames=("tiles_x", "fused_depth16",
                                             "interpret"))
def expand_slots_pallas(rank, j, total, rect_word, aux_words, *, tiles_x: int,
                        fused_depth16: bool = False, interpret: bool = False):
    """Expand per-gaussian tables into per-slot sort operands.

    rank:      (C,) int32 owning gaussian per slot (nondecreasing)
    j:         (C,) int32 within-rect index
    total:     () int32 live slot count
    rect_word: (N,) uint32 packed rect (+ CULLED_BIT for invisible gaussians)
    aux_words: (N, K) uint32 words to carry (depth key, record words, ...)

    Returns (tile_key (C,) uint32, [aux_k (C,) uint32 ...]).
    """
    c = rank.shape[0]
    assert c % BLK == 0, f"capacity {c} must be a multiple of {BLK}"
    n_blocks = c // BLK
    n = rect_word.shape[0]
    n_aux = aux_words.shape[1]

    # per-block first rank: rank is nondecreasing, so this is just a stride
    block_r0 = rank[::BLK].astype(jnp.int32)

    # pad gaussian tables to whole window rows
    np_rows = -(-(n + 1) // LANES) + WIN_ROWS
    pad_to = np_rows * LANES - n
    rect_t = jnp.pad(rect_word, (0, pad_to)).view(jnp.int32).reshape(np_rows, LANES)
    aux_t = jnp.pad(aux_words, ((0, pad_to), (0, 0))).view(jnp.int32)
    aux_t = jnp.transpose(aux_t.reshape(np_rows, LANES, n_aux), (0, 2, 1))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, BLK_SUB, LANES), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLK_SUB, LANES), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=tuple(
            pl.BlockSpec((1, BLK_SUB, LANES), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(1 + n_aux)),
    )
    kernel = functools.partial(_expand_kernel, tiles_x=tiles_x, n_aux=n_aux,
                               fused_depth16=fused_depth16)
    outs = pl.pallas_call(
        kernel,
        out_shape=tuple(
            jax.ShapeDtypeStruct((n_blocks, BLK_SUB, LANES), jnp.uint32)
            for _ in range(1 + n_aux)),
        grid_spec=grid_spec,
        interpret=interpret,
    )(block_r0, total.reshape(1).astype(jnp.int32),
      rank.reshape(n_blocks, BLK_SUB, LANES),
      j.reshape(n_blocks, BLK_SUB, LANES),
      rect_t, aux_t)
    return tuple(o.reshape(c) for o in outs)


def expand_slots_xla(rank, j, total, rect_word, aux_words, *, tiles_x: int,
                     fused_depth16: bool = False):
    """Pure-XLA mirror of :func:`expand_slots_pallas` (oracle + CPU fallback)."""
    safe = jnp.maximum(rank, 0)
    rect = rect_word[safe]
    min_tx = (rect & jnp.uint32(0x3FF)).astype(jnp.int32)
    min_ty = ((rect >> 10) & jnp.uint32(0x3FF)).astype(jnp.int32)
    rect_w = jnp.maximum(((rect >> 20) & jnp.uint32(0x3FF)).astype(jnp.int32), 1)
    culled = (rect & jnp.uint32(CULLED_BIT)) != 0

    q = j // rect_w
    r = j - q * rect_w
    tile = ((min_ty + q) * tiles_x + min_tx + r).astype(jnp.uint32)

    aux = aux_words[safe]  # (C, K)
    slot = jnp.arange(rank.shape[0], dtype=jnp.int32)
    dead = (slot >= total) | culled
    if fused_depth16:
        key = (tile << 16) | (aux[:, 0] & jnp.uint32(0xFFFF))
    else:
        key = tile
    key = jnp.where(dead, jnp.uint32(SENTINEL), key)
    outs = [key]
    for k in range(aux.shape[1]):
        outs.append(jnp.where(dead, jnp.uint32(0), aux[:, k]))
    return tuple(outs)
