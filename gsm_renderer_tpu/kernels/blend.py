"""Tile blending (alpha compositing) — the render stage.

TPU-native equivalent of ``depthFirstRender`` / ``globalRender``
(DepthFirstShaders.metal:1703-1811, GlobalShaders.metal:1030-1187): front-to-back
alpha compositing of depth-ordered per-tile instance lists into color+depth.

Two implementations:

* :func:`blend_tiles_xla` — pure-XLA reference (used for tests and as the
  numerical oracle for the Pallas kernel).
* :func:`blend_tiles_pallas` — the production Pallas kernel.  One grid step per
  tile **row**; within a step it walks the row's tiles, DMA-ing each tile's
  instance span from the blend table in HBM and compositing 128 instances at a
  time:

    - the alpha exponent -q/2 + log(op) is either a broadcast FMA chain over
      centered linear forms (``exponent_mode="vpu"``) or ONE bf16 MXU matmul
      of per-instance quadratic coefficients (hi/lo split) against a per-tile
      row matrix (x'^2, x'y', y'^2, x', y', 1) in mid-tile-centered integer
      coordinates (``"mxu"``),
    - transmittance + accumulation are either a multiplicative Hillis-Steele
      scan over the instance (sublane) axis followed by a (128,P)x(128,4) MXU
      color contraction (``scan_mode="split16"``), or an associative tree
      REDUCTION of the composed (om, d) block state (``"reduce"``),
    - per-tile early exit once every pixel's transmittance < 1/255, mirroring
      the reference's saturation break (DepthFirstShaders.metal:1745-1747).

The production kernel consumes the sorted quantized records directly — a
(CB, 4, 128) uint32 table (the 16-byte ``GaussianRenderData`` as four words per
instance, dead slots zeroed) — and derives the linear-form attributes in-VMEM
per 128-instance chunk (f16 bit decode + one sincos per instance).  This keeps
HBM traffic at exactly 16 B/instance and removes the XLA attribute-derivation
pass.

The XLA reference blend still takes the expanded (CB, 16, 128) float32
attribute table:
  0..2  a1, b1, c1   (linear form u; absolute pixel coords)
  3..5  a2, b2, c2   (linear form v)
  6..8  r, g, b      color in [0, 1]
  9     depth
  10    opacity      (0 for dead/masked instances)
  11..15 spare (zero)
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = Any

ATTR_ROWS = 16
LANES = 128
# Default tile shape (DepthFirst/Local use 16x16; Global uses 32x16 —
# GlobalRenderer.swift:74-75).  All entry points take (tile_w, tile_h).
DEFAULT_TILE = (16, 16)

# attribute row indices
A1, B1, C1, A2, B2, C2, CR, CG, CB_, CD, COP = range(11)

MIN_TRANSMITTANCE = 1.0 / 255.0
DMA_DEPTH = 3  # per-tile first-chunk DMAs in flight
ALPHA_CLAMP = 0.99
WORD_ROWS = 4  # packed record words per instance in the kernel table
# Kernel-table layout: True = plane-major (W, CB, 128) — the table build is
# a LEADING-axis stack (one contiguous copy, like the expand table; the
# middle-axis concat of the (CB, W, 128) form is a strided interleave that
# shows up in the ranges+table stage) — chunk windows become one strided
# DMA across planes, the expand kernel's proven pattern.
PLANE_MAJOR_TABLE = True

# "First significant hit" alpha threshold for the Local renderer's depth output
# (LocalShaders.metal:529-537).
FIRST_HIT_ALPHA = 0.1


def build_blend_table(attrs: dict, capacity: int):
    """Pack per-instance attribute dict (arrays of length C) into the
    (CB, 16, 128) HBM blend-table layout."""
    cb = -(-capacity // LANES)
    rows = [attrs["a1"], attrs["b1"], attrs["c1"],
            attrs["a2"], attrs["b2"], attrs["c2"],
            attrs["r"], attrs["g"], attrs["b"],
            attrs["depth"], attrs["op"]]
    z = jnp.zeros_like(rows[0])
    rows += [z] * (ATTR_ROWS - len(rows))
    table = jnp.stack(rows, axis=0).astype(jnp.float32)  # (16, C)
    pad = cb * LANES - capacity
    if pad:
        table = jnp.pad(table, ((0, 0), (0, pad)))
    # (16, CB, 128) -> (CB, 16, 128)
    return jnp.transpose(table.reshape(ATTR_ROWS, cb, LANES), (1, 0, 2))


def build_words_table(sorted_word_list, capacity: int):
    """Pack sorted record words into the kernel table layout (16 B per
    instance per eye in HBM): plane-major (W, CB, 128) when
    ``PLANE_MAJOR_TABLE`` (a leading-axis stack — one contiguous copy),
    else the interleaved (CB, W, 128) form (a strided middle-axis concat).

    Takes the (C,) uint32 arrays separately: stacking to (C, W) and
    transposing the minor dims costs ~9 ms at 4M instances.
    """
    cb = -(-capacity // LANES)
    planes = []
    for w in sorted_word_list:
        w = w.astype(jnp.uint32)
        if w.shape[0] < cb * LANES:
            w = jnp.pad(w, (0, cb * LANES - w.shape[0]))
        if PLANE_MAJOR_TABLE:
            planes.append(w.view(jnp.int32).reshape(1, cb, LANES))
        else:
            planes.append(w.view(jnp.int32).reshape(cb, 1, LANES))
    return jnp.concatenate(planes, axis=0 if PLANE_MAJOR_TABLE else 1)


# ---------------------------------------------------------------------------------
# Pure-XLA reference blend
# ---------------------------------------------------------------------------------

def blend_tiles_xla(table, starts, counts, *, tiles_x: int, tiles_y: int,
                    max_per_tile: int, tile_w: int = 16, tile_h: int = 16,
                    tile_chunk: int = 64, depth_mode: str = "weighted",
                    r2_cutoff: float = 0.0, pixel_coords=None):
    """Reference blend: same math as the Pallas kernel, O(T * max_per_tile) memory.

    ``table``: (CB, 16, 128) blend table; ``starts``/``counts``: (T,) int32.
    ``pixel_coords``: optional (coord_x (TXP, P), coord_y (TY, P)) tables giving
    every pixel's coordinate in the gaussians' screen space — the foveated
    (rasterization-rate-map) path rasterizes a reduced physical target whose
    pixels sample non-uniform display coordinates.  None = uniform pixel grid.
    Returns (color (T, P, 4) with alpha, depth (T, P)) with P = tile_w * tile_h.
    Intended for tests and small scenes.
    """
    pix = tile_w * tile_h
    flat = jnp.transpose(table, (1, 0, 2)).reshape(ATTR_ROWS, -1)  # (16, C)
    cmax = flat.shape[1]

    px = (jnp.arange(pix, dtype=jnp.float32) % tile_w)
    py = (jnp.arange(pix, dtype=jnp.float32) // tile_w)

    t_iota = jnp.arange(tiles_x * tiles_y, dtype=jnp.int32)
    if pixel_coords is None:
        coord_x = ((t_iota % tiles_x).astype(jnp.float32) * tile_w)[:, None] \
            + px[None, :]
        coord_y = ((t_iota // tiles_x).astype(jnp.float32) * tile_h)[:, None] \
            + py[None, :]
    else:
        cx_tab, cy_tab = pixel_coords  # (TXP, P), (TY, P)
        coord_x = cx_tab[t_iota % tiles_x]
        coord_y = cy_tab[t_iota // tiles_x]

    def tile_block(start, count, cx, cy):
        k = jnp.arange(max_per_tile, dtype=jnp.int32)
        idx = jnp.clip(start + k, 0, cmax - 1)
        valid = k < count
        get = lambda r: jnp.where(valid, flat[r][idx], 0.0)  # (K,)
        a1, b1, c1 = get(A1), get(B1), get(C1)
        a2, b2, c2 = get(A2), get(B2), get(C2)
        r, g, b = get(CR), get(CG), get(CB_)
        d, op = get(CD), get(COP)

        pxa = cx[None, :]  # (1, P) pixel x in gaussian screen space
        pya = cy[None, :]
        u = a1[:, None] * pxa + b1[:, None] * pya + c1[:, None]
        v = a2[:, None] * pxa + b2[:, None] * pya + c2[:, None]
        q = u * u + v * v
        alpha = jnp.minimum(op[:, None] * jnp.exp(-0.5 * q), ALPHA_CLAMP)
        alpha = jnp.where(valid[:, None], alpha, 0.0)
        if r2_cutoff > 0.0:
            # HardwareRenderer fragment discard at r^2 > 9
            # (HardwareGaussianShaders.metal:771-780)
            alpha = jnp.where(q > r2_cutoff, 0.0, alpha)

        om = 1.0 - alpha
        trans = jnp.cumprod(om, axis=0)
        trans_excl = jnp.concatenate([jnp.ones((1, pix)), trans[:-1]], axis=0)
        w = alpha * trans_excl  # (K, P)
        a_out = 1.0 - trans[-1]
        col = jnp.stack(
            [jnp.sum(w * r[:, None], 0), jnp.sum(w * g[:, None], 0),
             jnp.sum(w * b[:, None], 0), a_out], axis=-1)  # (P, 4)
        if depth_mode == "first_hit":
            # Local renderer: depth of the first instance with alpha > 0.1
            # (LocalShaders.metal:529-537)
            hit = alpha > FIRST_HIT_ALPHA
            took = hit & (jnp.cumsum(hit.astype(jnp.int32), axis=0) == 1)
            depth = jnp.sum(jnp.where(took, d[:, None], 0.0), 0)
        elif depth_mode == "normalized":
            # Hardware postprocess: alpha-normalized depth
            # (HardwareGaussianShaders.metal:483-526)
            depth = jnp.sum(w * d[:, None], 0) / jnp.maximum(a_out, 1e-6)
        elif depth_mode == "none":
            # color-only output (DepthFirstRenderEncoder.swift:36-38); a
            # zero row keeps the lax.map output structure — the wrapper
            # returns None for depth
            depth = jnp.zeros((pix,), jnp.float32)
        else:
            depth = jnp.sum(w * d[:, None], 0)
        return col, depth

    def chunk_fn(args):
        return jax.vmap(tile_block)(*args)

    n_t = tiles_x * tiles_y
    pad = -(-n_t // tile_chunk) * tile_chunk - n_t
    args = (jnp.pad(starts, (0, pad)).reshape(-1, tile_chunk),
            jnp.pad(counts, (0, pad)).reshape(-1, tile_chunk),
            jnp.pad(coord_x, ((0, pad), (0, 0))).reshape(-1, tile_chunk, pix),
            jnp.pad(coord_y, ((0, pad), (0, 0))).reshape(-1, tile_chunk, pix))
    col, depth = jax.lax.map(chunk_fn, args)
    if depth_mode == "none":
        return col.reshape(-1, pix, 4)[:n_t], None
    return col.reshape(-1, pix, 4)[:n_t], depth.reshape(-1, pix)[:n_t]


def assemble_image(tile_color, tile_depth, *, tiles_x: int, tiles_y: int,
                   width: int, height: int, tile_w: int = 16, tile_h: int = 16):
    """(T, P, C) tile rasters -> (H, W, C) image + (H, W) depth."""
    def unpack(t, ch):
        x = t.reshape(tiles_y, tiles_x, tile_h, tile_w, ch)
        x = jnp.transpose(x, (0, 2, 1, 3, 4))
        return x.reshape(tiles_y * tile_h, tiles_x * tile_w, ch)[:height, :width]

    color = unpack(tile_color, 4)
    if tile_depth is None:
        return color, None
    depth = unpack(tile_depth[..., None], 1)[..., 0]
    return color, depth


# ---------------------------------------------------------------------------------
# Pallas production kernel
# ---------------------------------------------------------------------------------

def _f16(bits_u32):
    """Decode f16 bit patterns (low 16 bits) to f32; subnormals flush to 0."""
    b = bits_u32 & jnp.uint32(0xFFFF)
    sign = (b >> 15) << 31
    exp = (b >> 10) & jnp.uint32(0x1F)
    mant = b & jnp.uint32(0x3FF)
    f32_bits = sign | ((exp + jnp.uint32(112)) << 23) | (mant << 13)
    val = jax.lax.bitcast_convert_type(f32_bits.astype(jnp.uint32), jnp.float32)
    return jnp.where(exp == 0, 0.0, val)


def _u16f(w):
    return (w & jnp.uint32(0xFFFF)).astype(jnp.int32).astype(jnp.float32)


def _u8f(w):
    return (w & jnp.uint32(0xFF)).astype(jnp.int32).astype(jnp.float32)


def _mult_scan_exclusive(om):
    """Multiplicative Hillis-Steele scan over axis 0 of (G, P).

    Returns (exclusive_products, total_product_row) where
    exclusive[i] = prod(om[:i]) and total = prod(om).  (A two-level grouped
    scan was measured no faster: the reshape/broadcast overhead offsets the
    saved doubling steps.)"""
    g = om.shape[0]
    y = om
    k = 1
    while k < g:
        shifted = jnp.pad(y, ((k, 0), (0, 0)), constant_values=1.0)[:g, :]
        y = y * shifted
        k *= 2
    excl = jnp.pad(y, ((1, 0), (0, 0)), constant_values=1.0)[:g, :]
    return excl, y[g - 1:g, :]


def _mult_scan_exclusive_split(om, chunk: int):
    """Two-level multiplicative exclusive scan via STATIC slices: scan
    ``chunk``-wide pieces independently (2*log2(chunk)+1 ops at (chunk, P)
    each — cheaper per element than the full-width doubling), then chain the
    piece totals with broadcast carries and concat.

    Op accounting at G=128, chunk=32: 4x11 ops at (32,P) + 3 carry mults +
    1 concat ~= 12.75 (128,P)-equivalents vs 15 for the flat scan.  (An
    earlier RESHAPE-based grouped scan measured no faster — the (K,chunk,P)
    relayout ate the win; this version never leaves 2D.)"""
    g = om.shape[0]
    pieces = []
    tot = None
    for i in range(0, g, chunk):
        e, t = _mult_scan_exclusive(om[i:i + chunk])
        if tot is not None:
            e = e * tot
            t = t * tot
        pieces.append(e)
        tot = t
    return jnp.concatenate(pieces, axis=0), tot


def _mxu_mult_scan_exclusive(om, ltri_b):
    """Multiplicative exclusive scan via the MXU: texcl = exp(L @ log(om))
    with L strictly lower-triangular ones.

    The log-sum runs as TWO bf16 matmuls over a hi/lo split of log(om)
    (f32 accumulation), keeping ~2^-16 relative precision — the 14-op VPU
    Hillis-Steele doubling scan becomes 2 cheap MXU issues + one log1p/exp
    pair.  Returns (exclusive_products (G, P), total_product_row (1, P))."""
    lg = jnp.log1p(om - 1.0)  # log(om) = log1p(-alpha); om >= 0.01 (clamp)
    hi = lg.astype(jnp.bfloat16)
    lo = (lg - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    esum = (jax.lax.dot_general(ltri_b, hi, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
            + jax.lax.dot_general(ltri_b, lo, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32))
    excl = jnp.exp(esum)
    total = excl[-1:] * om[-1:]
    return excl, total


def _add_scan_exclusive(x):
    """Additive Hillis-Steele scan over axis 0 of (G, P); returns
    (exclusive_sums, total_row)."""
    g = x.shape[0]
    y = x
    k = 1
    while k < g:
        shifted = jnp.pad(y, ((k, 0), (0, 0)))[:g, :]
        y = y + shifted
        k *= 2
    excl = jnp.pad(y, ((1, 0), (0, 0)))[:g, :]
    return excl, y[g - 1:g, :]


def _row_blend_kernel(starts_ref, counts_ref, oyoff_ref, *refs,
                      tiles_x: int, tile_w: int, tile_h: int,
                      blocks_per_dma: int, depth_mode: str = "weighted",
                      r2_cutoff: float = 0.0, warped: bool = False,
                      skip_period: int = 0, compute_dtype: str = "f32",
                      n_eyes: int = 1, scan_mode: str = "split16",
                      sub_g: int = LANES, chunk_prefetch: bool = True,
                      exponent_mode: str = "vpu", sub_cond: bool = False,
                      probe: str = ""):
    """One grid step = one tile row.

    ``probe``: DIAGNOSTIC knockouts for localizing the kernel's bound
    (scratch/blendprobe.py); output is wrong under any non-empty value.
    "floor"  = skip all compute, keep the DMA/chunk-walk skeleton;
    "nocond" = drop the per-sub-block alive cond (masked execution);
    "noexp"  = rational alpha surrogate instead of exp/log;
    "noscan" = transmittance ones + product reduce instead of the scan.

    DMA latency is hidden with tile-level double buffering: while tile t's first
    chunk is being composited, tile t+1's first chunk is already in flight
    (most tiles need exactly one chunk).  Extra chunks of heavy tiles fall back
    to synchronous copies into the same buffer.
    """
    mxu_exp = exponent_mode == "mxu"
    if warped and mxu_exp:
        # foveated MXU-exponent: TILE-CENTERED coordinate tables (small
        # magnitudes keep the bf16 row split accurate) + integer per-tile
        # origins via scalar prefetch
        xo_ref, yo_ref, table_ref, xtab_ref, ytab_ref, out_ref = refs
    elif warped:
        # foveated: per-pixel coordinate tables in the gaussians' (display)
        # screen space replace the uniform iota grid
        xo_ref = yo_ref = None
        table_ref, xtab_ref, ytab_ref, out_ref = refs
    else:
        xo_ref = yo_ref = xtab_ref = ytab_ref = None
        table_ref, out_ref = refs
    r_dma = blocks_per_dma
    pix = tile_w * tile_h
    first_hit = depth_mode == "first_hit"
    # "none": color-only output — the reference skips the depth texture when
    # the caller passes none or a .depth32Float target
    # (DepthFirstRenderEncoder.swift:36-38, 60-80).  Drops the depth column
    # from the accumulator/contraction and the depth output plane.
    no_depth = depth_mode == "none"
    n_c = 3 if no_depth else 4
    ty = pl.program_id(0)
    # bf16 mode: the (128, P) inner arithmetic runs in bfloat16 — the VPU's
    # packed 2x-throughput dtype — mirroring the reference's half-precision
    # blending (depthFirstRender blends in half end-to-end,
    # DepthFirstShaders.metal:1698-1811).  The pixel-minus-mean subtraction
    # stays f32 (bf16 rounding of the ABSOLUTE mean would cost whole pixels;
    # rounding the centered offset keeps errors relative), and the
    # cross-chunk transmittance carry + color accumulator stay f32 (the MXU
    # accumulates bf16 operands into f32 natively — better than the
    # reference's half accumulators).
    bf = compute_dtype == "bf16"
    cdt = jnp.bfloat16 if bf else jnp.float32
    # n_eyes == 2: single-pass dual-eye blend over the SHARED tile list, one
    # accumulator/transmittance set per eye, early exit only when both eyes
    # saturate — the reference's depthFirstStereoRender structure
    # (DepthFirstShaders.metal:1825-1982).  The table carries 4 record words
    # per eye per instance (8 rows).
    word_rows = WORD_ROWS * n_eyes
    if scan_mode == "mxu":
        # strictly-lower-triangular ones for the MXU log-scan (built once;
        # lives in registers/VMEM as a loop constant)
        ri = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
        ci = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
        ltri_b = (ri > ci).astype(jnp.bfloat16)

    pidx = jax.lax.broadcasted_iota(jnp.int32, (1, pix), 1)
    px_row = (pidx % tile_w).astype(jnp.float32)   # (1, P) tile-local x
    py_row = (pidx // tile_w).astype(jnp.float32)

    # MXU exponent mode: the whole per-pair chain -q/2 + log(op) collapses to
    # ONE matmul  e = C @ R  with per-instance quadratic coefficients C and a
    # per-tile row matrix R = (x'^2, x'y', y'^2, x', y', 1) in TILE-LOCAL
    # coordinates.  Uniform grids: x', y' are small exact integers, so R is
    # EXACT in bf16 and a hi/lo split of C (both halves bf16-exact f32 values;
    # the TPU's default-precision matmul truncates operands to bf16 with f32
    # accumulation) keeps ~2^-18 relative precision — no 6-pass f32 emulation
    # (the round-2 "MXU u/v" rejection) and ~11 fewer (128, P) VPU ops.
    n_k = 0
    rows_const = None
    if mxu_exp:
        n_k = 12 if not warped else 18
        if not warped:
            # MID-TILE-centered integer coords: |x'| <= tile_w/2 keeps every
            # row product <= 256, the largest bf16-exact integer (corner-
            # anchored 32-wide tiles would produce x'^2 up to 961, which
            # bf16 rounds by up to 2 — enough to corrupt the exponent)
            xr = px_row - float(tile_w // 2)
            yr = py_row - float(tile_h // 2)
            r6 = jnp.concatenate(
                [xr * xr, xr * yr, yr * yr, xr, yr, jnp.ones_like(xr)],
                axis=0)
            rows_const = jnp.concatenate([r6, r6], axis=0)  # (12, P)

    # instance-id iota per composited sub-block (sub_g <= LANES instances at a
    # time: the scan costs 2*log2(G) VPU ops per instance batch, so smaller
    # sub-blocks trade scan steps for per-block fixed cost — a measured knob)
    g_iota = jax.lax.broadcasted_iota(jnp.int32, (sub_g, 1), 0)
    n_sub = LANES // sub_g

    def first_block(tid):
        return starts_ref[tid] // LANES

    def body(scr, sem):
        # scr: (DMA_DEPTH, r_dma, 16, 128) pipelined tile buffers

        def chunk_window(blk):
            if PLANE_MAJOR_TABLE:
                return table_ref.at[:, pl.ds(blk, r_dma)]
            return table_ref.at[pl.ds(blk, r_dma)]

        def start_dma(buf, blk):
            cp = pltpu.make_async_copy(chunk_window(blk),
                                       scr.at[buf], sem.at[buf])
            cp.start()
            return cp

        def wait_dma(buf, blk):
            pltpu.make_async_copy(chunk_window(blk),
                                  scr.at[buf], sem.at[buf]).wait()

        # prime the pipeline: first chunks of tiles 0..DMA_DEPTH-2 in flight
        # (per-copy latency is ~us; one-ahead prefetch left it half exposed)
        for j in range(min(DMA_DEPTH - 1, tiles_x)):
            start_dma(j % DMA_DEPTH, first_block(ty * tiles_x + j))

        def tile_loop(tx, _):
            buf = jax.lax.rem(tx, DMA_DEPTH)
            tid = ty * tiles_x + tx
            start = starts_ref[tid]
            count = counts_ref[tid]
            end = start + count
            blk0 = start // LANES
            n_chunks = jax.lax.div(end - blk0 * LANES + (r_dma * LANES - 1),
                                   r_dma * LANES)

            wait_dma(buf, blk0)
            # keep DMA_DEPTH-1 future tiles' first chunks in flight
            @pl.when(tx + DMA_DEPTH - 1 < tiles_x)
            def _():
                start_dma(jax.lax.rem(tx + DMA_DEPTH - 1, DMA_DEPTH),
                          first_block(tid + DMA_DEPTH - 1))

            rows_t = rows_const
            pxa = pya = None
            if warped and mxu_exp:
                # tile-centered display coords (small magnitudes); rows get a
                # hi/lo split since they are no longer exact integers.
                xc = xtab_ref[tx]                     # (1, P) centered x
                yc = ytab_ref[0]
                ox = xo_ref[tx].astype(jnp.float32)   # integer tile origin
                oy = yo_ref[ty].astype(jnp.float32)
                r6 = jnp.concatenate(
                    [xc * xc, xc * yc, yc * yc, xc, yc,
                     jnp.ones_like(xc)], axis=0)      # (6, P)
                r6h = r6.astype(jnp.bfloat16).astype(jnp.float32)
                rows_t = jnp.concatenate([r6h, r6 - r6h, r6h], axis=0)
            elif warped:
                pxa = xtab_ref[tx]                    # (1, P) display-space x
                pya = ytab_ref[0]
            else:
                # mxu mode's coefficient origin sits at the MID-TILE center
                # the row matrix is built around (see rows_const)
                ox = (tx * tile_w + (tile_w // 2 if mxu_exp else 0)
                      ).astype(jnp.float32)
                oy = ((ty + oyoff_ref[0]) * tile_h
                      + (tile_h // 2 if mxu_exp else 0)).astype(jnp.float32)
                pxa = px_row + ox                     # (1, P) absolute pixel x
                pya = py_row + oy

            def compute_chunk(c, buf2, carry, first_chunk=False):
                # Decode the whole chunk's records ONCE at (r_dma, 128) shape —
                # per-sub-block decode on (128, 1) vectors uses 1/256th of the
                # VPU and dominated the kernel.  Transposed to (128, r_dma) so
                # sub-blocks slice (128, 1) columns.
                wblk = pltpu.bitcast(scr[buf2], jnp.uint32)
                if probe == "floor":
                    # DMA/chunk-walk floor: consume the buffer with one tiny
                    # reduce so the copies stay live, no (128, P) compute
                    # (scr is i32; u32->f32 casts are unsupported in Mosaic)
                    s = jnp.sum(scr[buf2].astype(jnp.float32)) * 1e-30
                    accs0, transs0, fhs0 = carry
                    return ((accs0[0] + s,) + accs0[1:], transs0, fhs0)
                if mxu_exp:
                    # in-range mask at decode shape (r_dma, 128): folded into
                    # the p5 coefficient so dead/out-of-span slots cost no
                    # (128, P) masking op
                    ri_d = jax.lax.broadcasted_iota(jnp.int32, (r_dma, LANES), 0)
                    li_d = jax.lax.broadcasted_iota(jnp.int32, (r_dma, LANES), 1)
                    gidx_d = (blk0 + c * r_dma) * LANES + ri_d * LANES + li_d
                    in_rng = jnp.logical_and(gidx_d >= start, gidx_d < end)
                eyes = []
                for e in range(n_eyes):
                    if PLANE_MAJOR_TABLE:       # wblk: (4E, r_dma, 128)
                        w0 = wblk[4 * e + 0]
                        w1 = wblk[4 * e + 1]
                        w2 = wblk[4 * e + 2]
                        w3 = wblk[4 * e + 3]
                    else:                       # wblk: (r_dma, 4E, 128)
                        w0 = wblk[:, 4 * e + 0, :]
                        w1 = wblk[:, 4 * e + 1, :]
                        w2 = wblk[:, 4 * e + 2, :]
                        w3 = wblk[:, 4 * e + 3, :]
                    theta = _u16f(w1) * (3.14159265358979 / 65535.0)
                    s1 = jnp.maximum(_f16(w1 >> 16), 1e-4)
                    s2 = jnp.maximum(_f16(w2), 1e-4)
                    cth = jnp.cos(theta)
                    sth = jnp.sin(theta)
                    i1 = 1.0 / s1
                    i2 = 1.0 / s2
                    if mxu_exp:
                        # per-instance quadratic coefficients of the exponent
                        # e = -q/2 + log(op) in tile-local coords:
                        # e = p0 x'^2 + p1 x'y' + p2 y'^2 + p3 x' + p4 y' + p5
                        # (expansion of q = u^2 + v^2 with u = a1 x' + b1 y'
                        # + u0; all (r_dma, 128)-shaped — 1/256th VPU cost)
                        mxp = _f16(w0)
                        myp = _f16(w0 >> 16)
                        dxc = ox - mxp
                        dyc = oy - myp
                        i1s = i1 * i1
                        i2s = i2 * i2
                        cc = cth * cth
                        ss = sth * sth
                        cs = cth * sth
                        p0 = -0.5 * (i1s * cc + i2s * ss)
                        p1 = -cs * (i1s - i2s)
                        p2 = -0.5 * (i1s * ss + i2s * cc)
                        u0 = i1 * (cth * dxc + sth * dyc)
                        v0 = i2 * (cth * dyc - sth * dxc)
                        p3 = -(cth * i1 * u0 - sth * i2 * v0)
                        p4 = -(sth * i1 * u0 + cth * i2 * v0)
                        op = _u8f(w3 >> 24) * (1.0 / 255.0)
                        logop = jnp.where(
                            jnp.logical_and(in_rng, op > 0),
                            jnp.log(jnp.maximum(op, 1e-12)), -30000.0)
                        # NO clamp on p5: the -0.5*(u0^2+v0^2) constant term
                        # balances the quadratic's cross terms — flooring it
                        # flips dead-slot exponents positive.  All inputs are
                        # finite (dxc <= screen extent, i1 <= 1e4 => u0^2 <=
                        # ~5e17 f32-finite) and exp(very negative) is exact 0.
                        p5 = -0.5 * (u0 * u0 + v0 * v0) + logop
                        # hi/lo split: both halves are bf16-exact f32 values;
                        # the default-precision matmul truncates to bf16 with
                        # f32 accumulation, so C @ R carries ~2^-18 relative
                        # precision of the exact coefficients
                        coeff = [p0, p1, p2, p3, p4, p5]
                        hi = [p.astype(jnp.bfloat16).astype(jnp.float32)
                              for p in coeff]
                        lo = [p - h for p, h in zip(coeff, hi)]
                        # uniform: C=[hi|lo] vs R=[R6;R6]; warped:
                        # C=[hi|hi|lo] vs R=[R6h;R6lo;R6h]
                        planes = hi + hi + lo if warped else hi + lo
                        cstack = jnp.concatenate(
                            [p[rb:rb + 1] for rb in range(r_dma)
                             for p in planes], axis=0)  # (n_k*r_dma, 128)
                        restp = [
                            _f16(w2 >> 16),                  # 0: depth
                            _u8f(w3) * (1.0 / 255.0),        # 1: r
                            _u8f(w3 >> 8) * (1.0 / 255.0),   # 2: g
                            _u8f(w3 >> 16) * (1.0 / 255.0),  # 3: b
                        ]
                        if r2_cutoff > 0.0:
                            restp.append(logop)              # 4: log opacity
                        rest = jnp.concatenate(restp, axis=0)
                        eyes.append((jnp.transpose(cstack),
                                     jnp.transpose(rest)))
                        continue
                    # centered linear forms: u = a1*(px-mx) + b1*(py-my), v
                    # likewise — the subtraction happens per-pixel in f32 so
                    # low-precision rounding error stays RELATIVE to the
                    # offset (the reference's half path centers the same way:
                    # d = pixelCenter - mean, DepthFirstShaders.metal:1753-1759)
                    # All 11 per-instance planes ride ONE sublane<->lane
                    # transpose (vs 11 small ones — lane crossings are the
                    # expensive shape op on the VPU).
                    stacked = jnp.concatenate([
                        _f16(w0),                       # 0: mx
                        _f16(w0 >> 16),                 # 1: my
                        _f16(w2 >> 16),                 # 2: depth
                        _u8f(w3) * (1.0 / 255.0),       # 3: r
                        _u8f(w3 >> 8) * (1.0 / 255.0),  # 4: g
                        _u8f(w3 >> 16) * (1.0 / 255.0),  # 5: b
                        _u8f(w3 >> 24) * (1.0 / 255.0),  # 6: opacity
                        cth * i1,                       # 7: a1
                        sth * i1,                       # 8: b1
                        -sth * i2,                      # 9: a2
                        cth * i2,                       # 10: b2
                    ], axis=0)
                    # (a "notrans" knockout probe was attempted to price this
                    # transpose: both a (1,1)->(128,22) broadcast and a
                    # reduce-splat fake crash Mosaic/the lowering emitter, so
                    # the crossing cannot be knocked out in isolation; the
                    # bound from the other probes caps the WHOLE non-DMA
                    # non-exp non-scan residue — transpose + weights + alpha
                    # mults — at ~1.4 ms of the 6.4-6.8 isolated stage)
                    eyes.append(jnp.transpose(stacked))  # (128, 11 * r_dma)

                def sub_block(rb, h, carry2):
                    accs2, transs2, fhs2 = carry2
                    sbi = rb * n_sub + h
                    g0 = (blk0 + c * r_dma + rb) * LANES + h * sub_g
                    # skip sub-blocks past the tile's span AND (every
                    # ``skip_period``-th sub-block) saturated ones — the
                    # reference's early-exit at 128-instance granularity
                    # (DepthFirstShaders.metal:1745-1747).  The saturation
                    # check is a vector->scalar reduction feeding a branch,
                    # which stalls the VPU pipeline, so its frequency is a
                    # measured tuning knob (0 disables it).
                    alive = g0 < end
                    if skip_period > 0 and (sbi % skip_period == 0) and \
                            not (first_chunk and sbi == 0):
                        tmx = transs2[0]
                        for e in range(1, n_eyes):
                            tmx = jnp.maximum(tmx, transs2[e])
                        alive = jnp.logical_and(
                            alive, jnp.max(tmx) >= MIN_TRANSMITTANCE)

                    def live(carry3):
                        accs3, transs3, fhs3 = carry3
                        # plane k of sub-block rb in the fused-transpose
                        # layout (rb static: unrolled)
                        sl = lambda t, k: t[h * sub_g:(h + 1) * sub_g,
                                            k * r_dma + rb:
                                            k * r_dma + rb + 1]
                        gidx = g0 + g_iota
                        in_range = jnp.logical_and(gidx >= start, gidx < end)
                        out_a, out_t, out_f = [], [], []
                        for e in range(n_eyes):
                            if mxu_exp:
                                # one MXU issue computes the full exponent
                                # e = -q/2 + log(op) for the whole (G, P)
                                # block; VPU keeps only exp/min/om/scan/w
                                ceye, reye = eyes[e]
                                slr = lambda k: reye[h * sub_g:(h + 1) * sub_g,
                                                     k * r_dma + rb:
                                                     k * r_dma + rb + 1]
                                gdepth = slr(0)
                                cmat = ceye[h * sub_g:(h + 1) * sub_g,
                                            rb * n_k:(rb + 1) * n_k]
                                # explicit bf16 operands: a single MXU pass
                                # (an f32 Pallas dot triggers multi-pass
                                # emulation); the casts are exact — both
                                # sides hold bf16-exact values
                                e_mat = jax.lax.dot_general(
                                    cmat.astype(jnp.bfloat16),
                                    rows_t.astype(jnp.bfloat16),
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
                                alpha = jnp.minimum(jnp.exp(e_mat),
                                                    ALPHA_CLAMP).astype(cdt)
                                if r2_cutoff > 0.0:
                                    # q > cutoff  <=>  e < log(op) - cutoff/2
                                    alpha = jnp.where(
                                        e_mat < slr(4) - 0.5 * r2_cutoff,
                                        cdt(0.0), alpha)
                                cols = jnp.concatenate(
                                    [slr(1), slr(2), slr(3)]
                                    + ([] if no_depth else [gdepth]),
                                    axis=1).astype(cdt)
                            else:
                                ey = eyes[e]
                                gdepth = sl(ey, 2)
                                # centered offsets in f32, then the broadcast
                                # FMA chain (128,1) x (1,P) in compute dtype
                                dx = (pxa - sl(ey, 0)).astype(cdt)
                                dy = (pya - sl(ey, 1)).astype(cdt)
                                u = (sl(ey, 7).astype(cdt) * dx
                                     + sl(ey, 8).astype(cdt) * dy)
                                v = (sl(ey, 9).astype(cdt) * dx
                                     + sl(ey, 10).astype(cdt) * dy)
                                q = u * u + v * v              # (128, P)

                                # fold opacity into the exponent: alpha =
                                # exp(-q/2 + log(op)) — one fused fma + exp
                                # instead of exp + multiply; masked/zero
                                # opacity maps to exp(-inf) = 0
                                if probe == "noexp":
                                    # alpha-like rational surrogate (decays
                                    # with q, bounded by opacity, keeps the
                                    # early-exit dynamics comparable) with no
                                    # transcendental
                                    opm = jnp.where(in_range, sl(ey, 6),
                                                    0.0).astype(cdt)
                                    alpha = jnp.minimum(
                                        opm / (cdt(1.0) + q),
                                        cdt(ALPHA_CLAMP))
                                else:
                                    log_op = jnp.log(jnp.where(
                                        in_range, sl(ey, 6),
                                        0.0)).astype(cdt)
                                    alpha = jnp.minimum(
                                        jnp.exp(q * cdt(-0.5) + log_op),
                                        cdt(ALPHA_CLAMP))
                                if r2_cutoff > 0.0:
                                    # fragment discard at r^2 > cutoff
                                    # (HardwareGaussianShaders.metal:771-780)
                                    alpha = jnp.where(q > cdt(r2_cutoff),
                                                      cdt(0.0), alpha)
                                cols = jnp.concatenate(
                                    [sl(ey, 3), sl(ey, 4), sl(ey, 5)]
                                    + ([] if no_depth else [gdepth]),
                                    axis=1).astype(cdt)

                            om = cdt(1.0) - alpha
                            if scan_mode == "reduce" and not first_hit:
                                # Tree REDUCTION instead of a scan: the blend
                                # only needs the block's COMPOSED state, not
                                # per-instance transmittances.  Compositing
                                # is associative — (om_a, d_a) then (om_b,
                                # d_b) composes to (om_a*om_b, d_a +
                                # om_a*d_b) — so 7 halving levels of 5 ops
                                # each (~5 (G,P)-equivalents total) replace
                                # the 12-op Hillis-Steele scan + w-multiply +
                                # MXU contraction.  Adjacent pairing rides a
                                # row-major (g, P) -> (g/2, 2P) reshape
                                # (lane-merge of sublane pairs).
                                states = [om] + [alpha * cols[:, k:k + 1]
                                                 for k in range(n_c)]
                                g_cur = sub_g
                                while g_cur > 1:
                                    half = g_cur // 2
                                    m = [x.reshape(half, 2 * pix)
                                         for x in states]
                                    a0 = m[0][:, :pix]
                                    states = ([a0 * m[0][:, pix:]]
                                              + [m[k][:, :pix]
                                                 + a0 * m[k][:, pix:]
                                                 for k in range(1, n_c + 1)])
                                    g_cur = half
                                ttot = states[0].astype(jnp.float32)  # (1, P)
                                contrib = jnp.transpose(
                                    jnp.concatenate(states[1:], axis=0)
                                    .astype(jnp.float32))             # (P, 4)
                                contrib = contrib * jnp.transpose(transs3[e])
                                out_a.append(accs3[e] + contrib)
                                out_t.append(transs3[e] * ttot)
                                out_f.append(fhs3[e])
                                continue
                            if probe == "noscan":
                                # ones in place of the exclusive prefix; keep
                                # the block total (log-tree product reduce) so
                                # saturation exits fire comparably
                                texcl = jnp.ones_like(om)
                                # static-slice halving tree (reduce_prod has
                                # no Mosaic lowering)
                                tt = om
                                g_cur = sub_g
                                while g_cur > 1:
                                    g_cur //= 2
                                    tt = tt[:g_cur] * tt[g_cur:2 * g_cur]
                                ttot = tt
                            elif scan_mode == "mxu":
                                texcl, ttot = _mxu_mult_scan_exclusive(
                                    om.astype(jnp.float32), ltri_b)
                                texcl = texcl.astype(cdt)
                            elif scan_mode.startswith("split"):
                                texcl, ttot = _mult_scan_exclusive_split(
                                    om, int(scan_mode[5:]))
                            else:
                                texcl, ttot = _mult_scan_exclusive(om)
                            # fold the per-pixel running transmittance into
                            # the (P, 4) contribution instead of the (128, P)
                            # weights (same math; one large multiply becomes
                            # a small one)
                            w = alpha * texcl              # (128, P)

                            contrib = jax.lax.dot_general(
                                w, cols, (((0,), (0,)), ((), ())),
                                precision=(None if bf
                                           else jax.lax.Precision.HIGHEST),
                                preferred_element_type=jnp.float32)  # (P, 4)
                            contrib = contrib * jnp.transpose(transs3[e])
                            fh3 = fhs3[e]
                            if first_hit:
                                # depth of the first alpha > 0.1 instance
                                # (LocalShaders.metal:529-537): fh row0 = hit
                                # count, row1 = first-hit depth
                                hit = (alpha > cdt(FIRST_HIT_ALPHA)).astype(
                                    jnp.float32)
                                hexcl, htot = _add_scan_exclusive(hit)
                                took = hit * jnp.where(
                                    fh3[0:1, :] + hexcl > 0.0, 0.0, 1.0)
                                dfh = jax.lax.dot_general(
                                    took, gdepth, (((0,), (0,)), ((), ())),
                                    precision=jax.lax.Precision.HIGHEST,
                                    preferred_element_type=jnp.float32)
                                fh3 = jnp.concatenate(
                                    [fh3[0:1, :] + htot,
                                     fh3[1:2, :] + jnp.transpose(dfh)], axis=0)
                            out_a.append(accs3[e] + contrib)
                            out_t.append(transs3[e]
                                         * ttot.astype(jnp.float32))
                            out_f.append(fh3)
                        return (tuple(out_a), tuple(out_t), tuple(out_f))

                    if probe == "nocond" or (not sub_cond
                                             and skip_period == 0):
                        # masked execution: out-of-span sub-blocks blend
                        # exactly zero (the in_range opacity mask maps them
                        # to alpha = exp(-inf) = 0, om = 1), so the cond is
                        # purely a skip — and the knockout probe measured the
                        # two conds per chunk COSTLIER than the ~1.3 dead
                        # sub-blocks per tile they skip (6.4-6.7 baseline vs
                        # 5.9 ms isolated; scratch/blendprobe.py)
                        return live((accs2, transs2, fhs2))
                    return jax.lax.cond(alive, live, lambda c3: c3,
                                        (accs2, transs2, fhs2))

                carry2 = carry
                for rb in range(r_dma):  # unrolled: rb/h must be static
                    for h in range(n_sub):
                        carry2 = sub_block(rb, h, carry2)
                return carry2

            # Empty-tile skip (the reference dispatches only nonempty tiles
            # from a GPU-built active list, DepthFirstShaders.metal:1258-1369):
            # ``count`` is a prefetched SMEM scalar, so this branch costs no
            # vector->scalar reduction — material on sparse scenes, 4K grids
            # and foveated targets where many tiles are empty.
            @pl.when(count == 0)
            def _():
                zero = jnp.zeros((1, pix), jnp.float32)
                for e in range(n_eyes):
                    for ch in range(4 if no_depth else 5):
                        out_ref[0, 8 * e + ch, tx, :] = zero[0]

            @pl.when(count > 0)
            def _():
                carry0 = (
                    tuple(jnp.zeros((pix, n_c), jnp.float32)
                          for _ in range(n_eyes)),
                    tuple(jnp.ones((1, pix), jnp.float32)
                          for _ in range(n_eyes)),
                    tuple(jnp.zeros((2, pix), jnp.float32)
                          for _ in range(n_eyes)),
                )
                # chunk 0 from the double buffer
                carry = compute_chunk(0, buf, carry0, first_chunk=True)

                def tmax_of(transs):
                    # dual-eye: exit only when BOTH eyes saturate (the
                    # reference's stereo render checks per-eye transmittance,
                    # DepthFirstShaders.metal:1825-1982)
                    tmx = transs[0]
                    for e in range(1, n_eyes):
                        tmx = jnp.maximum(tmx, transs[e])
                    return jnp.max(tmx)

                # Extra chunks of heavy tiles.  The early-exit transmittance
                # check is carried as a scalar and only computed for tiles
                # that actually have more chunks — a per-tile vector->scalar
                # reduction in the while condition would stall the pipeline on
                # every (mostly single-chunk) tile.  With ``chunk_prefetch``
                # chunk c+1 DMAs into the spare buffer (index DMA_DEPTH — odd
                # chunks) or this tile's own pipeline buffer (even chunks,
                # whose first-chunk content is already consumed) WHILE chunk c
                # computes — the synchronous copy-then-compute form exposes
                # the full DMA latency on every extra chunk (~half the live
                # chunks at the bench scene).  An early exit must DRAIN the
                # in-flight prefetch: its buffer/semaphore are reused by the
                # next tiles' first-chunk pipeline and an orphaned signal
                # would race them.
                tmax = jax.lax.cond(n_chunks > 1, tmax_of,
                                    lambda _t: jnp.float32(0.0), carry[1])

                def chunk_cp(c, bc):
                    return pltpu.make_async_copy(
                        chunk_window(blk0 + c * r_dma),
                        scr.at[bc], sem.at[bc])

                if chunk_prefetch:
                    spare = jnp.int32(DMA_DEPTH)

                    def chunk_buf(c):
                        return jnp.where(jax.lax.rem(c, 2) == 1, spare, buf)

                    # unconditionally on tmax, so "a prefetch for chunk c_f is
                    # in flight iff c_f < n_chunks" holds on EVERY loop exit
                    # (the drain below relies on it; a tmax-gated prologue
                    # would leave the saturated-after-chunk-0 case waiting on
                    # a DMA that never started)
                    @pl.when(n_chunks > 1)
                    def _():
                        chunk_cp(jnp.int32(1), spare).start()

                def chunk_cond(state):
                    c, carry, tmax = state
                    return jnp.logical_and(c < n_chunks,
                                           tmax >= MIN_TRANSMITTANCE)

                def chunk_body(state):
                    c, carry, _tmax = state
                    if chunk_prefetch:
                        bc = chunk_buf(c)
                        chunk_cp(c, bc).wait()

                        @pl.when(c + 1 < n_chunks)
                        def _():
                            chunk_cp(c + 1, chunk_buf(c + 1)).start()
                    else:
                        bc = buf
                        cp = chunk_cp(c, bc)
                        cp.start()
                        cp.wait()
                    carry = compute_chunk(c, bc, carry)
                    return c + 1, carry, tmax_of(carry[1])

                c_f, carry, _ = jax.lax.while_loop(
                    chunk_cond, chunk_body, (jnp.int32(1), carry, tmax))

                if chunk_prefetch:
                    # drain the prefetch orphaned by an early exit (issued for
                    # chunk c_f by the loop body — or the prologue — and
                    # never waited)
                    @pl.when(c_f < n_chunks)
                    def _():
                        chunk_cp(c_f, chunk_buf(c_f)).wait()

                accs, transs, fhs = carry
                for e in range(n_eyes):
                    acc_t = jnp.transpose(accs[e])        # (n_c, P)
                    a_out = 1.0 - transs[e][0]
                    out_ref[0, 8 * e + 0, tx, :] = acc_t[0]
                    out_ref[0, 8 * e + 1, tx, :] = acc_t[1]
                    out_ref[0, 8 * e + 2, tx, :] = acc_t[2]
                    out_ref[0, 8 * e + 3, tx, :] = a_out
                    if no_depth:
                        continue
                    if first_hit:
                        depth_out = fhs[e][1]
                    elif depth_mode == "normalized":
                        depth_out = acc_t[3] / jnp.maximum(a_out, 1e-6)
                    else:
                        depth_out = acc_t[3]
                    out_ref[0, 8 * e + 4, tx, :] = depth_out

            return 0

        jax.lax.fori_loop(0, tiles_x, tile_loop, 0)

    n_buf = DMA_DEPTH + (1 if chunk_prefetch else 0)  # +1: chunk-prefetch spare
    scr_shape = ((n_buf, word_rows, r_dma, LANES) if PLANE_MAJOR_TABLE
                 else (n_buf, r_dma, word_rows, LANES))
    pl.run_scoped(
        body,
        scr=pltpu.VMEM(scr_shape, jnp.int32),
        sem=pltpu.SemaphoreType.DMA((n_buf,)),
    )


@functools.partial(jax.jit, static_argnames=("tiles_x", "tiles_y", "tile_w",
                                             "tile_h", "blocks_per_dma",
                                             "interpret", "depth_mode",
                                             "r2_cutoff", "skip_period",
                                             "compute_dtype", "n_eyes",
                                             "scan_mode", "sub_g",
                                             "chunk_prefetch",
                                             "exponent_mode", "sub_cond",
                                             "probe"))
def blend_tiles_pallas(table, starts, counts, *, tiles_x: int, tiles_y: int,
                       tile_w: int = 16, tile_h: int = 16,
                       blocks_per_dma: int = 2, interpret: bool = False,
                       depth_mode: str = "weighted", r2_cutoff: float = 0.0,
                       tile_row_offset=None, pixel_coords=None,
                       skip_period: int = 0, compute_dtype: str = "f32",
                       n_eyes: int = 1, scan_mode: str = "split16",
                       sub_g: int = LANES, chunk_prefetch: bool = True,
                       exponent_mode: str = "vpu", sub_cond: bool = False,
                       probe: str = ""):
    """Production blend.  Returns (tile_color (T, P, 4), tile_depth (T, P)).

    ``table``: record-word table from :func:`build_words_table` — plane-major
    (W, CB, 128) under ``PLANE_MAJOR_TABLE``, else (CB, W, 128) — with
    instances depth-ordered within each tile's [start, start+count) span.
    ``tile_row_offset``: optional scalar — global tile-row index of this
    raster's first row (used by the multi-chip band-sharded path so pixel
    coordinates stay in global screen space).
    ``pixel_coords``: optional (coord_x (TX, P), coord_y (TY, P)) f32 tables —
    the foveated path's non-uniform display coordinates per physical pixel
    (see blend_tiles_xla).
    ``compute_dtype``: "f32" or "bf16" — precision of the (128, P) inner
    blend arithmetic (bf16 mirrors the reference's half-precision blending,
    DepthFirstShaders.metal:1698-1811; accumulators stay f32 either way).
    ``n_eyes``: 2 = single-pass dual-eye blend over a shared tile list whose
    table carries both eyes' records (8 words/instance,
    depthFirstStereoRender — DepthFirstShaders.metal:1825-1982); returns a
    list of per-eye (tile_color, tile_depth) pairs.
    ``sub_cond``: True restores the per-sub-block alive lax.cond; the default
    (False) executes every sub-block masked — out-of-span instances blend
    exactly zero through the in_range opacity mask, and the knockout probe
    measured the two scalar-gated conds per chunk COSTLIER than the ~1.3
    dead sub-blocks per tile they skip (isolated blend stage 6.4-6.7 vs
    5.9 ms, bitwise-identical frames; scratch/blendprobe.py,
    scratch/subcondab.py).  A ``skip_period`` > 0 saturation check still
    uses the cond.
    """
    pix = tile_w * tile_h
    n_t = tiles_x * tiles_y
    txp = -(-tiles_x // 8) * 8

    # fixed-size DMA windows may overrun the last blocks: pad the table's
    # block axis (axis 1 in the plane-major layout).
    if PLANE_MAJOR_TABLE:
        table = jnp.pad(table, ((0, 0), (0, blocks_per_dma), (0, 0)))
    else:
        table = jnp.pad(table, ((0, blocks_per_dma), (0, 0), (0, 0)))
    table = table.view(jnp.int32) if table.dtype == jnp.uint32 else table
    if tile_row_offset is None:
        tile_row_offset = jnp.zeros((), jnp.int32)

    warped = pixel_coords is not None
    mxu_exp = exponent_mode == "mxu"
    extra_args = []
    extra_specs = []
    prefetch_extra = []
    if warped:
        cx_tab, cy_tab = pixel_coords
        cx_tab = cx_tab.astype(jnp.float32)
        cy_tab = cy_tab.astype(jnp.float32)
        if mxu_exp:
            # tile-center the tables (small magnitudes keep the bf16 row
            # split accurate); integer origins ride scalar prefetch
            xo = jnp.round(cx_tab[:, 0]).astype(jnp.int32)   # (TX,)
            yo = jnp.round(cy_tab[:, 0]).astype(jnp.int32)   # (TY,)
            cx_tab = cx_tab - xo[:, None].astype(jnp.float32)
            cy_tab = cy_tab - yo[:, None].astype(jnp.float32)
            prefetch_extra = [jnp.pad(xo, (0, txp - xo.shape[0])), yo]
        cx_tab = jnp.pad(cx_tab,
                         ((0, txp - cx_tab.shape[0]), (0, 0)))[:, None, :]
        cy_tab = cy_tab[:, None, :]
        extra_args = [cx_tab, cy_tab]  # (TXP, 1, P), (TY, 1, P)
        extra_specs = [
            pl.BlockSpec((txp, 1, pix), lambda ty, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, pix), lambda ty, *_: (ty, 0, 0),
                         memory_space=pltpu.VMEM),
        ]

    chans = 8 * n_eyes
    kernel = functools.partial(_row_blend_kernel, tiles_x=tiles_x, tile_w=tile_w,
                               tile_h=tile_h, blocks_per_dma=blocks_per_dma,
                               depth_mode=depth_mode, r2_cutoff=r2_cutoff,
                               warped=warped, skip_period=skip_period,
                               compute_dtype=compute_dtype, n_eyes=n_eyes,
                               scan_mode=scan_mode, sub_g=sub_g,
                               chunk_prefetch=chunk_prefetch,
                               exponent_mode=exponent_mode,
                               sub_cond=sub_cond, probe=probe)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((tiles_y, chans, txp, pix),
                                       jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3 + len(prefetch_extra),
            grid=(tiles_y,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] + extra_specs,
            out_specs=pl.BlockSpec((1, chans, txp, pix),
                                   lambda ty, *_: (ty, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(starts.astype(jnp.int32), counts.astype(jnp.int32),
      tile_row_offset.reshape(1).astype(jnp.int32), *prefetch_extra,
      table, *extra_args)

    # (TY, chans, TXP, P) -> (T, P, chans)
    out = out[:, :, :tiles_x, :]                      # (TY, chans, TX, P)
    out = jnp.transpose(out, (0, 2, 3, 1))            # (TY, TX, P, chans)
    out = out.reshape(n_t, pix, chans)
    no_depth = depth_mode == "none"
    if n_eyes == 1:
        return out[..., 0:4], (None if no_depth else out[..., 4])
    return [(out[..., 8 * e:8 * e + 4],
             None if no_depth else out[..., 8 * e + 4])
            for e in range(n_eyes)]
