"""Pallas instance-expansion kernel.

Replaces the XLA gather/scatter-bound middle of the pipeline (slot-map
construction + per-slot gaussian lookup + tile-id computation — the equivalent
of the reference's instance-offset prefix sum and ``createInstancesKernel``,
DepthFirstShaders.metal:642-788, 2036-2139) with windowed VMEM work:

Slots are emitted in gaussian order with every gaussian owning >= 1 slot, so
the per-gaussian exclusive offsets are *strictly increasing* and a block of BLK
slots maps to a contiguous window of at most BLK+1 gaussians.  Each grid step:

  1. DMAs its gaussian window (one combined offsets/rect/record-word table,
     pipelined DMA_DEPTH deep across grid steps),
  2. resolves each slot's owning gaussian with a per-row binary search over a
     TWO-row sub-window selected from per-sublane-row base ranks precomputed
     in XLA (a row of 128 slots spans at most 128 gaussians),
  3. computes the closed-form tile id (float-reciprocal division) and emits the
     sort key plus K carried record words.

This removes the XLA slot-map stage (a 1M->4M scatter + 4M cummax + 4M gather
that cost ~40 ms/frame) and all elementwise HBM gathers (~10 ns/element).
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
BLK_SUB = 32                  # sublanes per slot block (measured: 32 > 16 > 8)
BLK = BLK_SUB * LANES         # slots per grid step
WIN_ROWS = BLK_SUB + 2        # gaussian window rows (BLK+1 gaussians + misalign)
WIN = WIN_ROWS * LANES
DMA_DEPTH = 3                 # window buffers in flight (latency ~us per DMA)

# Plain Python ints (module-level jnp arrays become device-committed closure
# constants that trip jax 0.9.0's constant-argument dispatch on CPU).
SENTINEL = 0xFFFFFFFF
# rect_word bit 30 marks a culled gaussian (its single slot gets the sentinel)
CULLED_BIT = 1 << 30
# rect_word bit 31 marks a gaussian with an exact pre-counted tile MASK: its
# instance count is the mask popcount and the j-th instance maps to the j-th
# set bit in the fixed 8-wide/4-row mask layout (bit = dy * 8 + dx) — the
# TPU shape of the reference's exact-count-before-expansion discipline
# (depthFirstProjectCullKernel counts exact touched tiles at projection and
# createInstancesKernel emits only passing instances,
# DepthFirstShaders.metal:181-219, :642-788, sizing maxInstances at
# 4 x maxGaussians — DepthFirstResources.swift:80-81).
MASKED_BIT = 1 << 31
MASK_W, MASK_H = 8, 4  # fixed mask window (rect_w <= 8, rect_h <= 4)
# offsets-table padding: larger than any slot index
OFFSET_PAD = 0x7FFFFFFF


def _popcount(v):
    """SWAR popcount of a uint32 vector (Mosaic-safe: shifts/ands/mults)."""
    v = v - ((v >> 1) & jnp.uint32(0x55555555))
    v = (v & jnp.uint32(0x33333333)) + ((v >> 2) & jnp.uint32(0x33333333))
    v = (v + (v >> 4)) & jnp.uint32(0x0F0F0F0F)
    return ((v * jnp.uint32(0x01010101)) >> 24).astype(jnp.int32)


def _nth_set_bit(mask_u32, jj):
    """Bit index of the (jj+1)-th set bit of ``mask_u32`` (valid for
    jj < popcount): binary ascent on the prefix popcount."""
    p = jnp.zeros_like(jj)
    for step in (16, 8, 4, 2, 1):
        cand = p + step
        low = jnp.left_shift(jnp.uint32(1), cand.astype(jnp.uint32)) - \
            jnp.uint32(1)  # bits strictly below cand (cand <= 31)
        p = jnp.where(_popcount(mask_u32 & low) <= jj, cand, p)
    return p


def _conic_from_words(w0, w1, w2):
    """Decode conic (ca, cb, cc) + mean + precomputed reciprocals from the
    quantized record words (formulas identical to ``_record_d2min``)."""
    mx = _f16_bits_to_f32(w0)
    my = _f16_bits_to_f32(w0 >> 16)
    theta = (w1 & jnp.uint32(0xFFFF)).astype(jnp.int32).astype(jnp.float32) * (
        3.14159265358979 / 65535.0)
    s1 = jnp.maximum(_f16_bits_to_f32(w1 >> 16), 1e-4)
    s2 = jnp.maximum(_f16_bits_to_f32(w2), 1e-4)
    c = jnp.cos(theta)
    s = jnp.sin(theta)
    iv1 = 1.0 / (s1 * s1)
    iv2 = 1.0 / (s2 * s2)
    ca = c * c * iv1 + s * s * iv2
    cb = c * s * (iv1 - iv2)
    cc = s * s * iv1 + c * c * iv2
    return dict(mx=mx, my=my, ca=ca, cb=cb, cc=cc,
                inv_a=1.0 / jnp.maximum(ca, 1e-20),
                inv_c=1.0 / jnp.maximum(cc, 1e-20))


def _d2min_rect(con, xmin, xmax, ymin, ymax):
    """minQuadRect of a decoded conic over a mean-centered rect."""
    ca, cb, cc = con["ca"], con["cb"], con["cc"]
    inside = (xmin <= 0.0) & (0.0 <= xmax) & (ymin <= 0.0) & (0.0 <= ymax)

    def quad(x, y):
        return ca * x * x + 2.0 * cb * x * y + cc * y * y

    q1 = quad(xmin, jnp.clip(-(cb * con["inv_c"]) * xmin, ymin, ymax))
    q2 = quad(xmax, jnp.clip(-(cb * con["inv_c"]) * xmax, ymin, ymax))
    q3 = quad(jnp.clip(-(cb * con["inv_a"]) * ymin, xmin, xmax), ymin)
    q4 = quad(jnp.clip(-(cb * con["inv_a"]) * ymax, xmin, xmax), ymax)
    return jnp.where(inside, 0.0,
                     jnp.minimum(jnp.minimum(q1, q2), jnp.minimum(q3, q4)))


def exact_tile_masks(w0, w1, w2, w3, min_tx, min_ty, rect_w, rect_h,
                     tile_w: int, tile_h: int, alpha_threshold: float):
    """Exact per-tile pass mask over a gaussian's clamped tile rect, for rects
    fitting the fixed MASK_W x MASK_H window.

    Evaluates the same quantized-record minQuadRect <= d2Cutoff predicate the
    expand kernel applies (``_exact_tile_test``) at up to 32 rect positions
    per gaussian, packing passes into a u32 (bit = dy * 8 + dx).  Returns
    (mask (N,) uint32, count (N,) int32 = popcount).  The caller decides
    eligibility (rect_w <= 8 and rect_h <= 4) and falls back to full-rect
    counting otherwise.
    """
    tau = max(alpha_threshold, 1e-12)
    con = _conic_from_words(w0, w1, w2)
    op = ((w3 >> 24) & jnp.uint32(0xFF)).astype(jnp.int32).astype(
        jnp.float32) * (1.0 / 255.0)
    cutoff = jnp.where(op < tau, -1.0,
                       -2.0 * jnp.log(tau / jnp.maximum(op, 1e-30)))

    x_base = min_tx.astype(jnp.float32) * tile_w - con["mx"]
    y_base = min_ty.astype(jnp.float32) * tile_h - con["my"]

    mask = jnp.zeros(w0.shape, jnp.uint32)
    for p in range(MASK_W * MASK_H):
        dx, dy = p % MASK_W, p // MASK_W
        xmin = x_base + float(dx * tile_w)
        ymin = y_base + float(dy * tile_h)
        d2min = _d2min_rect(con, xmin, xmin + tile_w, ymin, ymin + tile_h)
        passes = (dx < rect_w) & (dy < rect_h) & (d2min <= cutoff)
        mask = mask | (passes.astype(jnp.uint32) << p)
    return mask, _popcount(mask)


def stereo_tile_masks(wl, wr, min_tx, min_ty, rect_w, rect_h,
                      tile_w: int, tile_h: int):
    """Dual-eye exact pass mask over the union tile rect: keep a position if
    EITHER eye's quantized ellipse reaches q <= STEREO_R2_CUTOFF inside the
    tile (the same predicate the expand kernel's "stereo" mode applies —
    output-identical pruning, since the stereo blend zeroes alpha past
    r^2 = 9; DepthFirstShaders.metal:1915-1935).

    ``wl``/``wr``: (w0, w1, w2) word triples of the left/right records.
    Returns (mask (N,) uint32, count (N,) int32)."""
    con_l = _conic_from_words(*wl)
    con_r = _conic_from_words(*wr)
    xl = min_tx.astype(jnp.float32) * tile_w - con_l["mx"]
    yl = min_ty.astype(jnp.float32) * tile_h - con_l["my"]
    xr = min_tx.astype(jnp.float32) * tile_w - con_r["mx"]
    yr = min_ty.astype(jnp.float32) * tile_h - con_r["my"]

    mask = jnp.zeros(min_tx.shape, jnp.uint32)
    for p in range(MASK_W * MASK_H):
        dx, dy = p % MASK_W, p // MASK_W
        ox, oy = float(dx * tile_w), float(dy * tile_h)
        d2l = _d2min_rect(con_l, xl + ox, xl + ox + tile_w,
                          yl + oy, yl + oy + tile_h)
        d2r = _d2min_rect(con_r, xr + ox, xr + ox + tile_w,
                          yr + oy, yr + oy + tile_h)
        passes = ((dx < rect_w) & (dy < rect_h)
                  & (jnp.minimum(d2l, d2r) <= STEREO_R2_CUTOFF))
        mask = mask | (passes.astype(jnp.uint32) << p)
    return mask, _popcount(mask)


def warped_bounds_gather(bounds_row, idx, span: int):
    """``bounds_row[idx + d]`` for d in [0, span) — (N, span) f32 — via a
    one-hot MXU matmul: an elementwise XLA gather prices ~6 ns/element
    (~50 ms at 1M x 9); the one-hot (N, 128) x (128, span) contraction rides
    the MXU at ~exact f32 (precision HIGHEST; each output row selects ONE
    table value).  ``idx + span - 1`` must stay < 128 (the foveated physical
    tile grid fits 127 tiles/axis — stereo.foveated_raster_tables).

    Kept as the XLA oracle for :func:`warped_bounds_gather_pallas` (the
    production path — the materialized one-hot cost ~2-3 ms at 1M)."""
    lanes = bounds_row.shape[-1]
    oh = (idx[:, None] == jnp.arange(lanes, dtype=jnp.int32)[None, :])
    shifted = jnp.stack([jnp.roll(bounds_row, -d) for d in range(span)],
                        axis=1)  # (128, span): shifted[t, d] = row[t + d]
    return jax.lax.dot_general(oh.astype(jnp.float32), shifted,
                               (((1,), (0,)), ((), ())),
                               precision=jax.lax.Precision.HIGHEST)


def _bgather_kernel(bounds_ref, tx_ref, ty_ref, out_ref):
    """One grid step gathers the (MASK_W + 1) x / (MASK_H + 1) y display
    boundaries for BLK_SUB rows of gaussians: lane-axis take_along_axis on
    the broadcast 128-lane bounds rows (the same gather the expand kernel's
    warped tile test uses per slot — here once per GAUSSIAN, pre-count)."""
    bxi = jnp.broadcast_to(bounds_ref[0:1, :], tx_ref.shape)
    byi = jnp.broadcast_to(bounds_ref[1:2, :], tx_ref.shape)
    tx = tx_ref[...]
    ty = ty_ref[...]
    for d in range(MASK_W + 1):
        idx = jnp.minimum(tx + d, LANES - 1)
        out_ref[d] = pltpu.bitcast(jnp.take_along_axis(bxi, idx, axis=1),
                                   jnp.int32)
    for d in range(MASK_H + 1):
        idx = jnp.minimum(ty + d, LANES - 1)
        out_ref[MASK_W + 1 + d] = pltpu.bitcast(
            jnp.take_along_axis(byi, idx, axis=1), jnp.int32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def warped_bounds_gather_pallas(bounds, min_tx, min_ty, *,
                                interpret: bool = False):
    """Per-gaussian window boundary coords from the (2, 128) bounds table:
    returns (fx list of MASK_W + 1 (N,) f32, fy list of MASK_H + 1) — the
    display coords of physical tile boundaries min_t + 0 .. min_t + span.
    See :func:`_bgather_kernel`; bitwise-equal to the XLA one-hot oracle
    (:func:`warped_bounds_gather`), tested in tests/test_foveated.py."""
    n = min_tx.shape[0]
    rows = -(-n // (BLK_SUB * LANES)) * BLK_SUB
    spans = (MASK_W + 1) + (MASK_H + 1)

    def prep(x):
        x = jnp.pad(x.astype(jnp.int32), (0, rows * LANES - n))
        return x.reshape(rows, LANES)

    in_spec = pl.BlockSpec((BLK_SUB, LANES), lambda i: (i, 0))
    out = pl.pallas_call(
        _bgather_kernel,
        grid=(rows // BLK_SUB,),
        in_specs=[pl.BlockSpec((2, LANES), lambda i: (0, 0)),
                  in_spec, in_spec],
        out_specs=pl.BlockSpec((spans, BLK_SUB, LANES), lambda i: (0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((spans, rows, LANES), jnp.int32),
        interpret=interpret,
    )(bounds.astype(jnp.float32).view(jnp.int32), prep(min_tx), prep(min_ty))
    planes = out.view(jnp.float32).reshape(spans, -1)
    fx = [planes[d, :n] for d in range(MASK_W + 1)]
    fy = [planes[MASK_W + 1 + d, :n] for d in range(MASK_H + 1)]
    return fx, fy


def stereo_warped_tile_masks(wl, wr, rect_w, rect_h, fx, fy, *, w3=None,
                             lod_min: float = 0.0, tile_w: int = 16,
                             tile_h: int = 16):
    """Dual-eye exact pre-count mask for the FOVEATED path: position
    (dx, dy) of the 8x4 window is tested against the physical tile's
    display-space pixel rect [fx[dx], fx[dx+1]] x [fy[dy], fy[dy+1]] — the
    same boundary-table predicate the expand kernel applies in warped mode,
    so the counts match the in-kernel survivors (the reference's
    count-before-expansion discipline, DepthFirstShaders.metal:181-219,
    under the rasterization-rate-map warp).  Borderline fma disagreements
    between the two compilations stay output-identical: the blend zeroes
    alpha past r^2 = 9 per pixel (DepthFirstShaders.metal:1915-1935).

    ``lod_min`` > 0 enables PERIPHERY LOD (beyond reference parity — the
    rate map only changes where the reference *shades*, not what it draws):
    at local rate product ar = (tile_w / display_tile_w) * (tile_h /
    display_tile_h), an instance is dropped where its opacity-weighted
    display footprint op * sigma1 * sigma2 * ar < lod_min * (1 - ar).  In
    the fovea ar = 1 so the threshold vanishes (exact output); toward the
    periphery sub-sample splats whose energy the reduced sampling rate
    cannot resolve are skipped.  Requires ``w3`` (the eye-shared
    color/opacity word).

    ``fx``: list of MASK_W + 1 (N,) display-x boundary coords of the
    window's tiles (:func:`warped_bounds_gather_pallas` at min_tx); ``fy``
    likewise.  Returns (mask (N,) uint32, count (N,) int32)."""
    con_l = _conic_from_words(*wl)
    con_r = _conic_from_words(*wr)
    if lod_min > 0.0:
        s1l = jnp.maximum(_f16_bits_to_f32(wl[1] >> 16), 1e-4)
        s2l = jnp.maximum(_f16_bits_to_f32(wl[2]), 1e-4)
        s1r = jnp.maximum(_f16_bits_to_f32(wr[1] >> 16), 1e-4)
        s2r = jnp.maximum(_f16_bits_to_f32(wr[2]), 1e-4)
        op = ((w3 >> 24) & jnp.uint32(0xFF)).astype(jnp.int32).astype(
            jnp.float32) * (1.0 / 255.0)
        ink = op * jnp.maximum(s1l * s2l, s1r * s2r)

    mask = jnp.zeros(rect_w.shape, jnp.uint32)
    for p in range(MASK_W * MASK_H):
        dx, dy = p % MASK_W, p // MASK_W
        x0 = fx[dx]
        x1 = fx[dx + 1]
        y0 = fy[dy]
        y1 = fy[dy + 1]
        d2l = _d2min_rect(con_l, x0 - con_l["mx"], x1 - con_l["mx"],
                          y0 - con_l["my"], y1 - con_l["my"])
        d2r = _d2min_rect(con_r, x0 - con_r["mx"], x1 - con_r["mx"],
                          y0 - con_r["my"], y1 - con_r["my"])
        passes = ((dx < rect_w) & (dy < rect_h)
                  & (jnp.minimum(d2l, d2r) <= STEREO_R2_CUTOFF))
        if lod_min > 0.0:
            ar = ((float(tile_w) / jnp.maximum(x1 - x0, 1e-6))
                  * (float(tile_h) / jnp.maximum(y1 - y0, 1e-6)))
            passes = passes & (ink * ar >= lod_min
                               * (1.0 - jnp.minimum(ar, 1.0)))
        mask = mask | (passes.astype(jnp.uint32) << p)
    return mask, _popcount(mask)


def _f16_bits_to_f32(bits_u32):
    """Decode IEEE float16 bit patterns (low 16 bits of a u32) to float32.

    Subnormals flush to zero (quantized record magnitudes are far above the
    f16 subnormal range); infinities/NaNs are not produced by the quantizer.
    """
    b = bits_u32 & jnp.uint32(0xFFFF)
    sign = (b >> 15) << 31
    exp = (b >> 10) & jnp.uint32(0x1F)
    mant = b & jnp.uint32(0x3FF)
    f32_bits = sign | ((exp + jnp.uint32(112)) << 23) | (mant << 13)
    # lax.bitcast works in both XLA and Mosaic (pltpu.bitcast rejects 1D)
    val = jax.lax.bitcast_convert_type(f32_bits.astype(jnp.uint32), jnp.float32)
    return jnp.where(exp == 0, 0.0, val)


def _record_d2min(w0, w1, w2, tile_x0, tile_x1, tile_y0, tile_y1):
    """Min squared-Mahalanobis distance of the quantized record's ellipse over
    the pixel rect [tile_x0, tile_x1] x [tile_y0, tile_y1]
    (minQuadRect, GaussianShared.h:525-564)."""
    mx = _f16_bits_to_f32(w0)
    my = _f16_bits_to_f32(w0 >> 16)
    # Mosaic has no u32->f32 cast; route through i32 (values < 2^31)
    theta = (w1 & jnp.uint32(0xFFFF)).astype(jnp.int32).astype(jnp.float32) * (
        3.14159265358979 / 65535.0)
    s1 = jnp.maximum(_f16_bits_to_f32(w1 >> 16), 1e-4)
    s2 = jnp.maximum(_f16_bits_to_f32(w2), 1e-4)

    c = jnp.cos(theta)
    s = jnp.sin(theta)
    iv1 = 1.0 / (s1 * s1)
    iv2 = 1.0 / (s2 * s2)
    ca = c * c * iv1 + s * s * iv2
    cb = c * s * (iv1 - iv2)
    cc = s * s * iv1 + c * c * iv2

    xmin = tile_x0 - mx
    xmax = tile_x1 - mx
    ymin = tile_y0 - my
    ymax = tile_y1 - my

    inside = (xmin <= 0.0) & (0.0 <= xmax) & (ymin <= 0.0) & (0.0 <= ymax)
    inv_a = 1.0 / jnp.maximum(ca, 1e-20)
    inv_c = 1.0 / jnp.maximum(cc, 1e-20)

    def quad(x, y):
        return ca * x * x + 2.0 * cb * x * y + cc * y * y

    q1 = quad(xmin, jnp.clip(-(cb * inv_c) * xmin, ymin, ymax))
    q2 = quad(xmax, jnp.clip(-(cb * inv_c) * xmax, ymin, ymax))
    q3 = quad(jnp.clip(-(cb * inv_a) * ymin, xmin, xmax), ymin)
    q4 = quad(jnp.clip(-(cb * inv_a) * ymax, xmin, xmax), ymax)
    d2min = jnp.where(inside, 0.0,
                      jnp.minimum(jnp.minimum(q1, q2), jnp.minimum(q3, q4)))
    return d2min


def _row_tile_span(w0, w1, w2, w3, ty, min_tx, rect_w, tile_w: float,
                   tile_h: float, alpha_threshold: float):
    """Exact (conservatively widened) tile-column span of the quantized
    record's ellipse within tile row ``ty``.

    The passing set of ``_exact_tile_test`` along one tile row is contiguous:
    a tile rect spans the row's full pixel band, so it intersects the convex
    ellipse {q <= d2Cutoff} iff its x-range meets the ellipse's x-extent over
    that band.  The extent is closed-form: for f(y) = -cb*y + sqrt(ca*k -
    det*y^2) (concave) the max over the clipped band is f at the clamped
    critical point, and symmetrically for the min.  Spans are widened by a
    small absolute+relative pad so float disagreement with the kernel's
    clamp-form ``_record_d2min`` can only ADD boundary tiles — which the
    in-kernel exact test then kills, keeping output bitwise identical to
    full-rect expansion (TPU shape of the reference's exact-count discipline,
    DepthFirstShaders.metal:181-219, extended to arbitrarily large rects).

    Returns (t_lo (i32), span (i32)); span == 0 when the ellipse misses the
    row (or opacity < tau).
    """
    mx = _f16_bits_to_f32(w0)
    my = _f16_bits_to_f32(w0 >> 16)
    theta = (w1 & jnp.uint32(0xFFFF)).astype(jnp.int32).astype(jnp.float32) * (
        3.14159265358979 / 65535.0)
    s1 = jnp.maximum(_f16_bits_to_f32(w1 >> 16), 1e-4)
    s2 = jnp.maximum(_f16_bits_to_f32(w2), 1e-4)
    c = jnp.cos(theta)
    s = jnp.sin(theta)
    iv1 = 1.0 / (s1 * s1)
    iv2 = 1.0 / (s2 * s2)
    ca = c * c * iv1 + s * s * iv2
    cb = c * s * (iv1 - iv2)
    # det = ca*cc - cb^2 == iv1*iv2 algebraically; the product form is exact
    # (the subtraction cancels catastrophically for anisotropic records)
    det = iv1 * iv2

    op = ((w3 >> 24) & jnp.uint32(0xFF)).astype(jnp.int32).astype(
        jnp.float32) * (1.0 / 255.0)
    tau = max(alpha_threshold, 1e-12)
    k = jnp.where(op < tau, -1.0,
                  -2.0 * jnp.log(tau / jnp.maximum(op, 1e-30)))

    y0 = ty.astype(jnp.float32) * tile_h - my
    y1 = y0 + tile_h
    cak = ca * k
    ylim = jnp.sqrt(jnp.maximum(cak / det, 0.0))
    yc0 = jnp.maximum(y0, -ylim)
    yc1 = jnp.minimum(y1, ylim)
    empty = (k < 0.0) | (yc0 > yc1)

    inv_ca = 1.0 / jnp.maximum(ca, 1e-20)
    # |y*| of the critical points of x+-(y) = (-cb*y -+ sqrt(ca*k - det*y^2))/ca
    t_mag = jnp.sqrt(jnp.maximum(cak / (det * (det + cb * cb)), 0.0))
    yb = jnp.clip(-cb * t_mag, yc0, yc1)
    ya = jnp.clip(cb * t_mag, yc0, yc1)

    def sq_disc(y):
        return jnp.sqrt(jnp.maximum(cak - det * y * y, 0.0))

    xb = (-cb * yb + sq_disc(yb)) * inv_ca
    xa = (-cb * ya - sq_disc(ya)) * inv_ca
    pad = 1e-5 * (jnp.abs(xa) + jnp.abs(xb)) + 0.125
    xs0 = xa + mx - pad
    xs1 = xb + mx + pad
    inv_tw = 1.0 / tile_w
    t_lo = jnp.floor(xs0 * inv_tw).astype(jnp.int32)
    t_hi = jnp.floor(xs1 * inv_tw).astype(jnp.int32)
    t_lo = jnp.maximum(t_lo, min_tx)
    t_hi = jnp.minimum(t_hi, min_tx + rect_w - 1)
    span = jnp.where(empty, 0, jnp.maximum(t_hi - t_lo + 1, 0))
    return t_lo, span


def _exact_tile_test(w0, w1, w2, w3, tx, ty, tile_w, tile_h, alpha_threshold):
    """FlashGS-style exact min-quadratic-over-rect test from the quantized
    record (DepthFirstShaders.metal:181-205, GaussianShared.h:525-593).

    Returns True where the instance's max alpha within its tile reaches tau.
    """
    x0 = tx.astype(jnp.float32) * tile_w
    y0 = ty.astype(jnp.float32) * tile_h
    d2min = _record_d2min(w0, w1, w2, x0, x0 + tile_w, y0, y0 + tile_h)
    op = ((w3 >> 24) & jnp.uint32(0xFF)).astype(jnp.int32).astype(
        jnp.float32) * (1.0 / 255.0)
    tau = max(alpha_threshold, 1e-12)
    cutoff = jnp.where(op < tau, -1.0, -2.0 * jnp.log(tau / jnp.maximum(op, 1e-30)))
    return d2min <= cutoff


# Per-pixel cutoff of the stereo/hardware blends (r^2 <= 9,
# HardwareGaussianShaders.metal:771-780, DepthFirstShaders.metal:1825-1982).
# Dropping instances whose d2min over the tile exceeds it is OUTPUT-IDENTICAL:
# the blend zeroes alpha at q > 9 anyway.
STEREO_R2_CUTOFF = 9.0


def _stereo_tile_test(aux_vals, x0, x1, y0, y1):
    """Dual-eye tile test: keep an instance if EITHER eye's quantized ellipse
    reaches q <= 9 inside the tile rect (aux words 1..4 = left record,
    5..8 = right record)."""
    d2_l = _record_d2min(aux_vals[1], aux_vals[2], aux_vals[3], x0, x1, y0, y1)
    d2_r = _record_d2min(aux_vals[5], aux_vals[6], aux_vals[7], x0, x1, y0, y1)
    return jnp.minimum(d2_l, d2_r) <= STEREO_R2_CUTOFF


def _window_slot_search(wblk, first_slot):
    """Resolve a block's BLK slots (``first_slot`` + [0, BLK)) to their owning
    table rows via the offsets plane ``wblk[0]`` (strictly increasing over
    live rows, OFFSET_PAD tail).

    Window-local base rank per sublane row (rank of the row's first slot) is
    counted from the offsets plane: window prefix below the block's first rank
    is entirely <= any row target and padding is OFFSET_PAD > any slot, so
    base(r) = #{k in window : off[k] <= first slot of row r} - 1.  A row of
    128 slots spans at most 128 rows from its base (offsets strictly
    increasing), so each lookup touches exactly TWO window rows selected once
    per block, and a 7-step binary ascent resolves the rank.

    Returns (slot (BLK_SUB, LANES) i32, jj = slot - offsets[row] i32,
    gather_plane(p) reading plane p at each slot's owning row, lo = the
    window-local owning row index).
    """
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (BLK_SUB, LANES), 0)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (BLK_SUB, LANES), 1)
    slot = first_slot + sub_iota * LANES + lane_iota

    tgt = first_slot + sub_iota * LANES       # row-constant targets
    acc = jnp.zeros((BLK_SUB, LANES), jnp.int32)
    for k in range(WIN_ROWS):
        acc += (wblk[0, k:k + 1, :] <= tgt).astype(jnp.int32)
    cnt = jnp.sum(acc, axis=1, keepdims=True)  # (BLK_SUB, 1)
    b = jnp.broadcast_to(jnp.minimum(cnt - 1, (WIN_ROWS - 1) * LANES - 1),
                         (BLK_SUB, LANES))
    w_r = b >> 7                              # constant within each row

    def two_rows(plane):
        """The two window rows every lookup of this block's row can touch."""
        rowA = jnp.zeros((BLK_SUB, LANES), jnp.int32)
        rowB = jnp.zeros((BLK_SUB, LANES), jnp.int32)
        for k in range(WIN_ROWS - 1):
            sel = w_r == k
            rowA = jnp.where(sel, wblk[plane, k:k + 1, :], rowA)
            rowB = jnp.where(sel, wblk[plane, k + 1:k + 2, :], rowB)
        return rowA, rowB

    offA, offB = two_rows(0)

    def off_at(idx):
        """offsets[idx] for window-local idx in [b, b+127]."""
        lane = idx & 127
        hi = (idx >> 7) != w_r
        va = jnp.take_along_axis(offA, lane, axis=1)
        vb = jnp.take_along_axis(offB, lane, axis=1)
        return jnp.where(hi, vb, va)

    # Per-row binary search: rank(slot) - b <= lane < 128 (offsets strictly
    # increasing), so a 7-step ascent suffices; track offsets[lo] alongside.
    lo = b
    lo_val = off_at(b)
    step = 64
    while step >= 1:
        cand = lo + step
        val = off_at(cand)
        ok = val <= slot
        lo = jnp.where(ok, cand, lo)
        lo_val = jnp.where(ok, val, lo_val)
        step //= 2

    jj = slot - lo_val
    lane_lo = lo & 127
    hi_lo = (lo >> 7) != w_r

    def gather_plane(plane):
        rowA, rowB = two_rows(plane)
        va = jnp.take_along_axis(rowA, lane_lo, axis=1)
        vb = jnp.take_along_axis(rowB, lane_lo, axis=1)
        return jnp.where(hi_lo, vb, va)

    return slot, jj, gather_plane, lo


def _expand_kernel(r0_ref, total_ref, rowoff_ref, tab_hbm,
                   *out_args, tiles_x: int, n_aux: int, fused_depth16: bool,
                   exact_mode: str, warped: bool, tile_w: int, tile_h: int,
                   alpha_threshold: float, has_mask: bool = False,
                   key_plan=None):
    """One grid step expands BLK slots.

    The three per-gaussian tables (offsets / rect / aux words) are packed as
    planes of ONE combined (rows, 2 + n_aux, 128) table so each block costs a
    single DMA, and windows are double-buffered across grid steps: while block
    i computes, block i+1's window is already in flight (the synchronous
    copy-then-compute version exposed the full DMA latency on every one of the
    thousands of blocks and dominated the kernel).

    The slot->gaussian search exploits per-SUBLANE-ROW base ranks: a row of
    128 slots spans at most 128 gaussians from its base rank, so every lookup
    touches exactly TWO window rows selected once per block — ~28 lane-gathers
    per block instead of ~170 masked gathers over the full 10-row window
    (gathers dominated the kernel; measured 9.1 ms -> the masked full-window
    form at 1M/4M slots).  The base ranks themselves are counted from the
    offsets plane IN-KERNEL (window prefix below the block's first rank is
    entirely <= any row target, padding is OFFSET_PAD > any slot, so
    base(r) = #{k in window : off[k] <= first slot of row r} - 1) — replacing
    an XLA searchsorted over capacity/128 queries that cost ~3.5 ms at 1M/4M
    with ~70 VPU ops per block (~0.3 ms).
    """
    if warped:
        bounds_ref = out_args[0]
        out_args = out_args[1:]
    out_refs = out_args[:1 + n_aux]
    win, sem = out_args[1 + n_aux:]
    i = pl.program_id(0)
    nb = pl.num_programs(0)

    def dma(buf, blk):
        row = r0_ref[blk] // LANES
        # plane-major table: one strided DMA grabs every plane's window rows
        return pltpu.make_async_copy(tab_hbm.at[:, pl.ds(row, WIN_ROWS)],
                                     win.at[buf], sem.at[buf])

    slot_buf = jax.lax.rem(i, DMA_DEPTH)

    @pl.when(i == 0)
    def _():
        # prime the pipeline: DMA_DEPTH - 1 windows in flight (grid size is
        # static, so the bound is a Python min)
        for j in range(min(DMA_DEPTH - 1, nb)):
            dma(j % DMA_DEPTH, j).start()

    dma(slot_buf, i).wait()

    @pl.when(i + DMA_DEPTH - 1 < nb)
    def _():
        dma(jax.lax.rem(i + DMA_DEPTH - 1, DMA_DEPTH), i + DMA_DEPTH - 1).start()

    wblk = win[slot_buf]                      # (planes, WIN_ROWS, LANES)

    # slot -> owning gaussian via the offsets plane (see _window_slot_search)
    slot, jj, gather_plane, lo = _window_slot_search(wblk, i * BLK)

    rect_u = pltpu.bitcast(gather_plane(1), jnp.uint32)
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
    if has_mask:
        # exact pre-counted gaussians: j-th instance = j-th set bit of the
        # 8-wide tile mask (see MASKED_BIT) — the exact test already ran at
        # projection, so these instances skip the in-kernel re-test
        mask_u = pltpu.bitcast(gather_plane(2), jnp.uint32)
        is_masked = (rect_u & jnp.uint32(MASKED_BIT)) != 0
        pbit = _nth_set_bit(mask_u, jj)
        q = jnp.where(is_masked, pbit >> 3, q)
        r = jnp.where(is_masked, pbit & 7, r)
    t_y = min_ty + q
    t_x = min_tx + r
    tile = (t_y * tiles_x + t_x).astype(jnp.uint32)

    aux_base = 3 if has_mask else 2
    aux_vals = []
    for a in range(n_aux):
        aux_vals.append(pltpu.bitcast(gather_plane(aux_base + a), jnp.uint32))

    dead = jnp.logical_or(slot >= total_ref[0], culled)
    if exact_mode == "mono":
        # exclude instances whose max alpha within the tile is below tau
        # (reference excludes them at instance creation —
        # DepthFirstShaders.metal:181-205); aux words 1..4 carry the record.
        # rowoff shifts band-local tile rows to global screen space
        # (multichip band sharding).
        passes = _exact_tile_test(aux_vals[1], aux_vals[2], aux_vals[3],
                                  aux_vals[4], t_x, t_y + rowoff_ref[0],
                                  float(tile_w), float(tile_h),
                                  alpha_threshold)
        if has_mask:
            # pre-counted gaussians already passed at projection; the mask
            # is the single source of truth for them
            passes = jnp.logical_or(passes, is_masked)
        dead = jnp.logical_or(dead, jnp.logical_not(passes))
    elif exact_mode == "stereo":
        # dual-eye r^2 <= 9 tile test (output-identical pruning: the stereo
        # blend zeroes alpha past r^2 = 9 anyway); with ``warped`` the tile
        # rect comes from the foveated boundary tables (one lane-gather —
        # the physical tile grid fits in 128 lanes)
        if warped:
            bxi = jnp.broadcast_to(bounds_ref[0:1, :], (BLK_SUB, LANES))
            byi = jnp.broadcast_to(bounds_ref[1:2, :], (BLK_SUB, LANES))

            def bgather(row, idx):
                v = jnp.take_along_axis(row, jnp.minimum(idx, LANES - 1),
                                        axis=1)
                return pltpu.bitcast(v, jnp.float32)

            x0 = bgather(bxi, t_x)
            x1 = bgather(bxi, t_x + 1)
            y0 = bgather(byi, t_y)
            y1 = bgather(byi, t_y + 1)
        else:
            x0 = t_x.astype(jnp.float32) * float(tile_w)
            x1 = x0 + float(tile_w)
            y0 = t_y.astype(jnp.float32) * float(tile_h)
            y1 = y0 + float(tile_h)
        passes = _stereo_tile_test(aux_vals, x0, x1, y0, y1)
        if has_mask and not warped:
            # dual-eye pre-counted gaussians already passed at projection
            # (mask predicate == this test).  Under the WARP the mask is a
            # conservative margin-widened superset, so the boundary-table
            # test must still prune — mask-kept slop otherwise reaches the
            # blend as near-zero-alpha work (measured: foveated 79.6 ms vs
            # stereo 70.1 with the bypass).
            passes = jnp.logical_or(passes, is_masked)
        dead = jnp.logical_or(dead, jnp.logical_not(passes))

    if key_plan is not None and not fused_depth16:
        # Tie-free fused 64-bit key pair (ops/binning.KeyPlan): key1 =
        # [tile | depth_hi], key2 = [depth_lo | gaussian_index].  aux 0 is
        # the span-normalized depth word; the gaussian index (= offsets-table
        # entry = window start row * 128 + window-local rank) is the
        # reference's stable tie order, making the downstream sort safely
        # UNSTABLE (measured ~7% of the headline frame; scratch/stabframe.py).
        d_hi, d_lo, idx_bits = key_plan
        dn = aux_vals[0]
        g0 = (r0_ref[i] // LANES) * LANES
        g = (g0 + lo).astype(jnp.uint32)
        key = (tile << d_hi) | (dn >> d_lo)
        key2 = ((dn & jnp.uint32((1 << d_lo) - 1)) << idx_bits) | g
        out_refs[0][0] = jnp.where(dead, jnp.uint32(SENTINEL), key)
        out_refs[1][0] = jnp.where(dead, jnp.uint32(SENTINEL), key2)
        for a in range(1, n_aux):
            out_refs[1 + a][0] = jnp.where(dead, jnp.uint32(0), aux_vals[a])
        return

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


def _pad_rows(x, n):
    """Pad a per-gaussian word plane to whole window rows: (rows, 128) i32.

    Planes are padded/reshaped individually and stacked on a NEW LEADING
    axis by the caller — a contiguous copy.  (The previous middle-axis
    layout required a strided interleaving concat; minor-dim transposes of
    stacked (N, K) arrays cost ~9 ms at 4M on TPU — see CLAUDE.md.)"""
    np_rows = -(-(n + 1) // LANES) + WIN_ROWS
    pad_to = np_rows * LANES - x.shape[0]
    x = jnp.pad(x, (0, pad_to))
    return x.view(jnp.int32).reshape(np_rows, LANES)


def _prep_kernel(rw_ref, rh_ref, dk_ref, *rest, n: int, tile_w: int,
                 tile_h: int, alpha_threshold: float, mode: str = "mono",
                 lod_min: float = 0.0, count_rows: bool = False):
    """One grid step preps BLK_SUB rows (4096 gaussians) of the combined
    expand table: exact 8x4 tile masks + pre-counts + the global exclusive
    instance-offset scan (carried across the sequential grid in SMEM) — the
    fused TPU form of the reference's count-then-prefix-sum discipline
    (depthFirstProjectCullKernel exact counts + instance-offset prefix sum,
    DepthFirstShaders.metal:181-219, :642-788).

    Replaces the XLA prep chain (32 unrolled minQuadRect evals + cumsum +
    7 x _pad_rows + plane stack, ~1.6 ms at 1M) with one elementwise pass
    that writes the (3 + 1 + n_words, rows, 128) plane-major table directly.

    ``mode``: "mono" (4 words, alpha-cutoff exact test), "stereo" (8 words
    = both eyes' records, dual-eye r^2 <= STEREO_R2_CUTOFF test — the same
    predicates binning_inputs applies in XLA), or "warped" (stereo + the
    foveated boundary-table rects: the tile's display-space pixel bounds
    come from lane-gathers of the (2, 128) bounds input, fusing
    warped_bounds_gather_pallas + stereo_warped_tile_masks into this pass).
    """
    if mode == "warped":
        *w_refs, bounds_ref, out_ref, carry_ref = rest
    else:
        *w_refs, out_ref, carry_ref = rest
    i = pl.program_id(0)

    carry = carry_ref[0]

    @pl.when(i == 0)
    def _():
        carry_ref[0] = 0

    carry = jnp.where(i == 0, 0, carry)

    rword = pltpu.bitcast(rw_ref[...], jnp.uint32)
    min_tx = (rword & jnp.uint32(0x3FF)).astype(jnp.int32)
    min_ty = ((rword >> 10) & jnp.uint32(0x3FF)).astype(jnp.int32)
    rect_w = ((rword >> 20) & jnp.uint32(0x3FF)).astype(jnp.int32)
    culled0 = (rword & jnp.uint32(CULLED_BIT)) != 0
    rect_h = rh_ref[...]
    w = [pltpu.bitcast(r[...], jnp.uint32) for r in w_refs]

    if mode == "warped":
        bxi = jnp.broadcast_to(bounds_ref[0:1, :], min_tx.shape)
        byi = jnp.broadcast_to(bounds_ref[1:2, :], min_tx.shape)

        def bg(row, base, d):
            idx = jnp.minimum(base + d, LANES - 1)
            return pltpu.bitcast(jnp.take_along_axis(row, idx, axis=1),
                                 jnp.float32)

        fx = [bg(bxi, min_tx, d) for d in range(MASK_W + 1)]
        fy = [bg(byi, min_ty, d) for d in range(MASK_H + 1)]
        mask, cnt = stereo_warped_tile_masks(w[0:3], w[4:7], rect_w, rect_h,
                                             fx, fy, w3=w[3], lod_min=lod_min,
                                             tile_w=tile_w, tile_h=tile_h)
    elif mode == "stereo":
        mask, cnt = stereo_tile_masks(w[0:3], w[4:7], min_tx, min_ty,
                                      rect_w, rect_h, tile_w, tile_h)
    else:
        mask, cnt = exact_tile_masks(w[0], w[1], w[2], w[3], min_tx, min_ty,
                                     rect_w, rect_h, tile_w, tile_h,
                                     alpha_threshold)

    visible = jnp.logical_not(culled0)
    eligible = visible & (rect_w <= MASK_W) & (rect_h <= MASK_H)
    if count_rows:
        # row-expansion prep (see row_expand_pallas): counts are VIRTUAL TILE
        # ROWS, not instances — mask-eligible and culled gaussians occupy one
        # row; oversized rects get one row per tile row, each of which the
        # row-expand kernel narrows to its exact ellipse column span
        counts = jnp.where(visible & jnp.logical_not(eligible), rect_h, 1)
    else:
        counts = jnp.where(visible,
                           jnp.where(eligible, cnt, rect_w * rect_h), 0)
    culled = jnp.logical_or(culled0, eligible & (cnt == 0))
    rect_out = (rword
                | jnp.where(eligible, jnp.uint32(MASKED_BIT), jnp.uint32(0))
                | jnp.where(culled, jnp.uint32(CULLED_BIT), jnp.uint32(0)))

    # every real gaussian owns >= 1 slot (strictly increasing offsets — the
    # expand kernel's window-search invariant); padding past n counts 0 so
    # position n lands on the grand total and the tail takes OFFSET_PAD
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (BLK_SUB, LANES), 0)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (BLK_SUB, LANES), 1)
    pos = (i * BLK_SUB + row_iota) * LANES + lane_iota
    counts = jnp.where(pos < n, jnp.maximum(counts, 1), 0)
    # zero the computed planes in the padding tail (bitwise parity with the
    # XLA _pad_rows construction; the search never selects them either way)
    rect_out = jnp.where(pos < n, rect_out, jnp.uint32(0))
    mask = jnp.where(pos < n, mask, jnp.uint32(0))

    # Exclusive prefix over the block in flat (row-major) position order.
    # Lane-axis scans run on the transposed block so the Hillis-Steele
    # shifts stay on the SUBLANE axis (the known-good shift direction).
    ct = jnp.transpose(counts)                    # (LANES, BLK_SUB)
    y = ct
    k = 1
    while k < LANES:
        y = y + jnp.pad(y, ((k, 0), (0, 0)))[:LANES, :]
        k *= 2
    row_tot = jnp.transpose(y[LANES - 1:LANES, :])  # (BLK_SUB, 1) row sums
    z = row_tot
    k = 1
    while k < BLK_SUB:
        z = z + jnp.pad(z, ((k, 0), (0, 0)))[:BLK_SUB, :]
        k *= 2
    block_sum = jnp.max(z)                        # z is monotone: max = total
    row_base = jnp.transpose(z - row_tot)         # (1, BLK_SUB) exclusive
    excl = jnp.transpose(y - ct + row_base)       # (BLK_SUB, LANES)

    off = carry + excl
    off = jnp.where(pos > n, OFFSET_PAD, off)
    carry_ref[0] = carry + block_sum

    out_ref[0] = off
    out_ref[1] = pltpu.bitcast(rect_out, jnp.int32)
    out_ref[2] = pltpu.bitcast(mask, jnp.int32)
    out_ref[3] = dk_ref[...]
    for k, r in enumerate(w_refs):
        out_ref[4 + k] = r[...]


@functools.partial(jax.jit, static_argnames=("tile_w", "tile_h",
                                             "alpha_threshold", "interpret",
                                             "mode", "lod_min", "count_rows"))
def binning_prep_pallas(rect_word, rect_h, depth_word, word_list, *,
                        tile_w: int = 16, tile_h: int = 16,
                        alpha_threshold: float = 0.005,
                        interpret: bool = False, mode: str = "mono",
                        warped_bounds=None, lod_min: float = 0.0,
                        count_rows: bool = False):
    """Fused binning prep: builds the complete combined plane-major expand
    table [offsets, rect, mask, depth, w0..w{K-1}] (3 + 1 + K, rows, 128) in
    one Pallas pass (see :func:`_prep_kernel`).  ``mode`` "mono" (K = 4),
    "stereo" (K = 8, dual-eye masks), or "warped" (K = 8 + the (2, 128)
    ``warped_bounds`` table — the foveated configuration).

    ``rect_word``: (N,) uint32 packed rect with CULLED_BIT already set for
    invisible gaussians (pre-mask visibility); ``rect_h``: (N,) int32 clamped
    rect height; ``word_list``: the K record words.  Returns the table, ready
    for :func:`expand_slots_pallas` via ``prebuilt_tab``.
    """
    n = rect_word.shape[0]
    np_rows = -(-(n + 2) // LANES) + WIN_ROWS
    rows = -(-np_rows // BLK_SUB) * BLK_SUB
    planes = 4 + len(word_list)

    def prep(x):
        x = jnp.pad(x, (0, rows * LANES - n))
        if x.dtype != jnp.int32:
            x = x.view(jnp.int32)
        return x.reshape(rows, LANES)

    ins = ([prep(rect_word), prep(rect_h.astype(jnp.int32)),
            prep(depth_word)] + [prep(w) for w in word_list])

    grid = rows // BLK_SUB
    in_spec = pl.BlockSpec((BLK_SUB, LANES), lambda i: (i, 0))
    in_specs = [in_spec] * len(ins)
    if mode == "warped":
        ins.append(warped_bounds.astype(jnp.float32).view(jnp.int32))
        in_specs.append(pl.BlockSpec((2, LANES), lambda i: (0, 0)))
    kernel = functools.partial(_prep_kernel, n=n, tile_w=tile_w,
                               tile_h=tile_h,
                               alpha_threshold=alpha_threshold, mode=mode,
                               lod_min=lod_min, count_rows=count_rows)
    tab = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((planes, BLK_SUB, LANES), lambda i: (0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((planes, rows, LANES), jnp.int32),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
        interpret=interpret,
    )(*ins)
    return tab


def _row_expand_kernel(r0_ref, total_ref, tab_hbm, out_ref, win, sem,
                       carry_ref, *, n_planes: int, r_cap: int, tile_w: int,
                       tile_h: int, alpha_threshold: float):
    """One grid step narrows BLK virtual tile rows to their exact column
    spans (see :func:`row_expand_pallas`): the same windowed-DMA +
    offsets-search machinery as ``_expand_kernel`` resolves each row slot to
    its owning gaussian and its tile-row index jj, then ``_row_tile_span``
    replaces the full-rect width with the ellipse's closed-form span.  The
    per-row instance counts are scanned into global exclusive offsets
    in-pass (the same transposed Hillis-Steele + SMEM carry as
    ``_prep_kernel``), so the output IS a complete expand table."""
    i = pl.program_id(0)
    nb = pl.num_programs(0)

    def dma(buf, blk):
        row = r0_ref[blk] // LANES
        return pltpu.make_async_copy(tab_hbm.at[:, pl.ds(row, WIN_ROWS)],
                                     win.at[buf], sem.at[buf])

    slot_buf = jax.lax.rem(i, DMA_DEPTH)

    @pl.when(i == 0)
    def _():
        for j in range(min(DMA_DEPTH - 1, nb)):
            dma(j % DMA_DEPTH, j).start()

    dma(slot_buf, i).wait()

    @pl.when(i + DMA_DEPTH - 1 < nb)
    def _():
        dma(jax.lax.rem(i + DMA_DEPTH - 1, DMA_DEPTH),
            i + DMA_DEPTH - 1).start()

    carry = carry_ref[0]

    @pl.when(i == 0)
    def _():
        carry_ref[0] = 0

    carry = jnp.where(i == 0, 0, carry)

    wblk = win[slot_buf]                      # (planes, WIN_ROWS, LANES)
    slot, jj, gather_plane, _lo = _window_slot_search(wblk, i * BLK)

    plane_vals = [gather_plane(p) for p in range(1, n_planes)]
    rect_u = pltpu.bitcast(plane_vals[0], jnp.uint32)
    mask_u = pltpu.bitcast(plane_vals[1], jnp.uint32)
    w0 = pltpu.bitcast(plane_vals[3], jnp.uint32)
    w1 = pltpu.bitcast(plane_vals[4], jnp.uint32)
    w2 = pltpu.bitcast(plane_vals[5], jnp.uint32)
    w3 = pltpu.bitcast(plane_vals[6], jnp.uint32)

    culled = (rect_u & jnp.uint32(CULLED_BIT)) != 0
    masked = (rect_u & jnp.uint32(MASKED_BIT)) != 0
    min_tx = (rect_u & jnp.uint32(0x3FF)).astype(jnp.int32)
    min_ty = ((rect_u >> 10) & jnp.uint32(0x3FF)).astype(jnp.int32)
    rect_w = ((rect_u >> 20) & jnp.uint32(0x3FF)).astype(jnp.int32)

    ty = min_ty + jj
    t_lo, span = _row_tile_span(w0, w1, w2, w3, ty, min_tx, rect_w,
                                float(tile_w), float(tile_h),
                                alpha_threshold)

    passthrough = jnp.logical_or(masked, culled)
    empty = jnp.logical_and(jnp.logical_not(passthrough), span == 0)
    rect2 = jnp.where(passthrough, rect_u,
                      t_lo.astype(jnp.uint32)
                      | (ty.astype(jnp.uint32) << 10)
                      | (span.astype(jnp.uint32) << 20))
    rect2 = jnp.where(empty, rect2 | jnp.uint32(CULLED_BIT), rect2)
    cnt2 = jnp.where(jnp.logical_or(culled, empty), 1,
                     jnp.where(masked, _popcount(mask_u), span))
    # rows past the true row total (or the static row capacity: row-overflow
    # drop) contribute no slots and zero planes (prep-construction parity)
    dead = jnp.logical_or(slot >= total_ref[0], slot >= r_cap)
    cnt2 = jnp.where(dead, 0, cnt2)

    # exclusive prefix over the block in flat position order + SMEM carry
    # (same transposed Hillis-Steele as _prep_kernel)
    ct = jnp.transpose(cnt2)                      # (LANES, BLK_SUB)
    y = ct
    k = 1
    while k < LANES:
        y = y + jnp.pad(y, ((k, 0), (0, 0)))[:LANES, :]
        k *= 2
    row_tot = jnp.transpose(y[LANES - 1:LANES, :])  # (BLK_SUB, 1)
    z = row_tot
    k = 1
    while k < BLK_SUB:
        z = z + jnp.pad(z, ((k, 0), (0, 0)))[:BLK_SUB, :]
        k *= 2
    block_sum = jnp.max(z)
    row_base = jnp.transpose(z - row_tot)         # (1, BLK_SUB)
    excl = jnp.transpose(y - ct + row_base)       # (BLK_SUB, LANES)

    off = carry + excl
    off = jnp.where(slot > r_cap, OFFSET_PAD, off)
    carry_ref[0] = carry + block_sum

    zero = jnp.uint32(0)
    out_ref[0] = off
    out_ref[1] = pltpu.bitcast(jnp.where(dead, zero, rect2), jnp.int32)
    for p in range(2, n_planes):
        out_ref[p] = jnp.where(dead, 0, plane_vals[p - 1])


@functools.partial(jax.jit, static_argnames=("n", "row_capacity", "tile_w",
                                             "tile_h", "alpha_threshold",
                                             "interpret"))
def row_expand_pallas(tab1, *, n: int, row_capacity: int, tile_w: int = 16,
                      tile_h: int = 16, alpha_threshold: float = 0.005,
                      interpret: bool = False):
    """Narrow the heavy tail's full-rect expansion to exact per-row spans.

    ``tab1``: a mono expand table built by :func:`binning_prep_pallas` with
    ``count_rows=True`` — its offsets count VIRTUAL TILE ROWS (one per
    mask-eligible/culled gaussian, ``rect_h`` for oversized rects).  This pass
    expands gaussians into those rows and replaces each oversized row's rect
    with ``pack(span_lo, ty, span_w)`` from the closed-form ellipse column
    span, producing a second expand table over ``row_capacity`` entries whose
    instance counts are near-exact for EVERY rect size.

    Rationale: full-rect fallback slots are the realistic heavy-tailed
    scene's dominant waste — 2.29M of 7.07M slots dead at the BASELINE PLY
    row (scratch/realprobe.py), each priced by the volume-bound composed
    instance sort AND walked by the blend as zero-alpha work.  The reference
    exact-counts every gaussian at projection (DepthFirstShaders.metal:
    181-219); the 8x4 mask window is the TPU shape of that discipline for
    small rects, and this pass extends it to the tail without widening the
    mask planes (a 16x16 mask tier = 8 extra table planes was the rejected
    alternative: ~+70% expand DMA).

    Returns (tab2, row_overflow) — tab2 plane layout identical to ``tab1``
    ([offsets, rect, mask, depth, w0..w3]), ready for
    :func:`expand_slots_pallas` via ``prebuilt_tab`` with
    ``n_gaussians=row_capacity``.
    """
    planes = tab1.shape[0]
    off1 = tab1[0].reshape(-1)
    total1 = off1[n]
    row_overflow = (total1 > row_capacity).astype(jnp.int32)
    r = row_capacity
    np_rows = -(-(r + 2) // LANES) + WIN_ROWS
    rows2 = -(-np_rows // BLK_SUB) * BLK_SUB
    n_blocks = rows2 // BLK_SUB
    block_starts = jnp.arange(n_blocks, dtype=jnp.int32) * BLK
    block_r0 = (jnp.searchsorted(off1[:n + 1], block_starts, side="right",
                                 method="scan_unrolled").astype(jnp.int32)
                - 1)
    block_r0 = jnp.clip(block_r0, 0, n - 1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((planes, BLK_SUB, LANES),
                               lambda i, *_: (0, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((DMA_DEPTH, planes, WIN_ROWS, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA((DMA_DEPTH,)),
            pltpu.SMEM((1,), jnp.int32),
        ],
    )
    kernel = functools.partial(_row_expand_kernel, n_planes=planes, r_cap=r,
                               tile_w=tile_w, tile_h=tile_h,
                               alpha_threshold=alpha_threshold)
    tab2 = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((planes, rows2, LANES), jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(block_r0, total1.reshape(1), tab1)
    return tab2, row_overflow


def row_expand_xla(tab1, *, n: int, row_capacity: int, tile_w: int = 16,
                   tile_h: int = 16, alpha_threshold: float = 0.005):
    """Pure-XLA mirror of :func:`row_expand_pallas` (oracle + CPU tests):
    identical table layout and bitwise-identical span arithmetic (the span
    helper is shared)."""
    from ..ops.binning import build_slot_map

    planes = tab1.shape[0]
    off1 = tab1[0].reshape(-1)
    total1 = off1[n]
    row_overflow = (total1 > row_capacity).astype(jnp.int32)
    counts1 = off1[1:n + 1] - off1[:n]
    sm = build_slot_map(counts1, row_capacity)
    rank = jnp.clip(sm.rank, 0, n - 1)

    def bc(x):
        return jax.lax.bitcast_convert_type(x, jnp.uint32)

    flat = [tab1[p].reshape(-1)[:n] for p in range(planes)]
    rect_u = bc(flat[1][rank])
    w0, w1, w2, w3 = (bc(flat[p][rank]) for p in range(4, 8))
    culled = (rect_u & jnp.uint32(CULLED_BIT)) != 0
    masked = (rect_u & jnp.uint32(MASKED_BIT)) != 0
    min_tx = (rect_u & jnp.uint32(0x3FF)).astype(jnp.int32)
    min_ty = ((rect_u >> 10) & jnp.uint32(0x3FF)).astype(jnp.int32)
    rect_w = ((rect_u >> 20) & jnp.uint32(0x3FF)).astype(jnp.int32)
    mask_u = bc(flat[2][rank])

    ty = min_ty + sm.j
    t_lo, span = _row_tile_span(w0, w1, w2, w3, ty, min_tx, rect_w,
                                float(tile_w), float(tile_h),
                                alpha_threshold)
    passthrough = masked | culled
    empty = ~passthrough & (span == 0)
    rect2 = jnp.where(passthrough, rect_u,
                      t_lo.astype(jnp.uint32)
                      | (ty.astype(jnp.uint32) << 10)
                      | (span.astype(jnp.uint32) << 20))
    rect2 = jnp.where(empty, rect2 | jnp.uint32(CULLED_BIT), rect2)
    cnt2 = jnp.where(culled | empty, 1,
                     jnp.where(masked, _popcount(mask_u), span))
    dead = ~sm.slot_valid
    cnt2 = jnp.where(dead, 0, cnt2)

    off2 = jnp.cumsum(cnt2) - cnt2
    total2 = off2[-1] + cnt2[-1]
    r = row_capacity
    np_rows = -(-(r + 2) // LANES) + WIN_ROWS
    rows2 = -(-np_rows // BLK_SUB) * BLK_SUB
    off_full = jnp.concatenate([off2.astype(jnp.int32),
                                total2.reshape(1).astype(jnp.int32)])
    off_plane = jnp.pad(off_full, (0, rows2 * LANES - (r + 1)),
                        constant_values=OFFSET_PAD).reshape(rows2, LANES)

    def pad_plane(x):
        x = jnp.where(dead, 0, x)
        if x.dtype != jnp.int32:
            x = jax.lax.bitcast_convert_type(x, jnp.int32)
        return jnp.pad(x, (0, rows2 * LANES - r)).reshape(rows2, LANES)

    out_planes = [off_plane, pad_plane(rect2), pad_plane(flat[2][rank])]
    for p in range(3, planes):
        out_planes.append(pad_plane(flat[p][rank]))
    return jnp.stack(out_planes, axis=0), row_overflow


@functools.partial(jax.jit, static_argnames=("capacity", "tiles_x",
                                             "fused_depth16", "interpret",
                                             "exact_test", "tile_w", "tile_h",
                                             "alpha_threshold",
                                             "n_gaussians", "key_plan"))
def expand_slots_pallas(counts, rect_word, aux_words, *, capacity: int,
                        tiles_x: int, fused_depth16: bool = False,
                        interpret: bool = False, exact_test=False,
                        tile_w: int = 16, tile_h: int = 16,
                        alpha_threshold: float = 0.005,
                        tile_row_offset=None, warped_bounds=None,
                        tile_mask=None, prebuilt_tab=None,
                        n_gaussians: int | None = None, key_plan=None):
    """Expand per-gaussian tables into per-slot sort operands.

    counts:    (N,) int32 instance counts, every entry >= 1
    rect_word: (N,) uint32 packed rect (+ CULLED_BIT for invisible gaussians,
      + MASKED_BIT for exact pre-counted gaussians when ``tile_mask`` is given)
    aux_words: (N, K) uint32 words to carry (depth key, record words, ...)
    capacity:  static slot count C (multiple of BLK)
    exact_test: False | True/"mono" (per-tile alpha-cutoff test from the
      mono record in aux 1..4) | "stereo" (dual-eye r^2 <= 9 test from the
      records in aux 1..4 and 5..8)
    warped_bounds: optional (2, 128) float32 — per-axis tile boundary pixel
      coordinates for the foveated physical grid (requires tiles <= 127 per
      axis; only with exact_test="stereo")
    tile_mask: optional (N,) uint32 exact pass masks (see
      :func:`exact_tile_masks`); MASKED_BIT gaussians must have
      counts == popcount(mask) (clamped to >= 1 with CULLED_BIT when 0)

    Returns (tile_key (C,) uint32, aux_0 ... aux_{K-1} (C,) uint32,
    total () int32, overflow () int32).  With ``key_plan`` (a
    KeyPlan.kernel_tuple; aux 0 must be the plan-normalized depth word) the
    first two outputs are instead the tie-free fused key pair
    [tile|depth_hi], [depth_lo|gaussian_index] — see ops/binning.KeyPlan.
    """
    exact_mode = ("mono" if exact_test is True
                  else exact_test if isinstance(exact_test, str) else "none")
    warped = warped_bounds is not None
    c = capacity
    assert c % BLK == 0, f"capacity {c} must be a multiple of {BLK}"
    n_blocks = c // BLK
    block_starts = jnp.arange(n_blocks, dtype=jnp.int32) * BLK

    if prebuilt_tab is not None:
        # table (incl. offsets plane + global scan) built by
        # :func:`binning_prep_pallas`; derive the scalars from its off plane
        n = n_gaussians
        tab = prebuilt_tab
        has_mask = True
        n_aux = tab.shape[0] - 3
        offsets_flat = tab[0].reshape(-1)
        total = offsets_flat[n]
        overflow = (total > c).astype(jnp.int32)
        block_r0 = (jnp.searchsorted(offsets_flat[:n + 1], block_starts,
                                     side="right",
                                     method="scan_unrolled").astype(jnp.int32)
                    - 1)
        block_r0 = jnp.clip(block_r0, 0, n - 1)
    else:
        n = rect_word.shape[0]
        aux_list = ([aux_words[:, k] for k in range(aux_words.shape[1])]
                    if not isinstance(aux_words, (list, tuple))
                    else list(aux_words))
        n_aux = len(aux_list)

        counts = counts.astype(jnp.int32)
        offsets = jnp.cumsum(counts)
        total = offsets[-1]
        overflow = (total > c).astype(jnp.int32)
        # exclusive offsets, one sentinel-ish tail entry (= total)
        offsets_ex = jnp.concatenate([jnp.zeros(1, jnp.int32), offsets])

        # Per-BLOCK first gaussian (rank of every BLK-th slot) for the window
        # DMAs; the per-sublane-row base ranks are counted in-kernel from the
        # offsets plane (an XLA searchsorted over capacity/128 queries
        # measured ~3.5 ms at 1M/4M — XLA:TPU gathers price every
        # searchsorted method).
        block_r0 = (jnp.searchsorted(offsets_ex, block_starts, side="right",
                                     method="scan_unrolled").astype(jnp.int32)
                    - 1)
        block_r0 = jnp.clip(block_r0, 0, n - 1)

        # pad the offsets table with OFFSET_PAD so the binary search never
        # walks past the last gaussian
        np_rows = -(-(n + 2) // LANES) + WIN_ROWS
        pad_to = np_rows * LANES - (n + 1)
        off_t = jnp.pad(offsets_ex, (0, pad_to),
                        constant_values=OFFSET_PAD).reshape(np_rows, LANES)
        has_mask = tile_mask is not None
        mask_planes = [_pad_rows(tile_mask, n)] if has_mask else []
        planes = ([_pad_rows(rect_word, n)] + mask_planes
                  + [_pad_rows(a, n) for a in aux_list])
        # align row counts and stack as a PLANE-MAJOR combined table
        # [offsets, rect, (mask,) aux_0 .. aux_{K-1}]: a leading-axis stack
        # is a contiguous copy (the per-block window is one strided DMA);
        # never a minor-dim transpose (CLAUDE.md gotcha)
        rows = max(off_t.shape[0], planes[0].shape[0])
        off_t = jnp.pad(off_t, ((0, rows - off_t.shape[0]), (0, 0)),
                        constant_values=OFFSET_PAD)
        planes = [jnp.pad(p, ((0, rows - p.shape[0]), (0, 0)))
                  for p in planes]
        tab = jnp.stack([off_t] + planes, axis=0)  # (planes, rows, LANES)

    if tile_row_offset is None:
        tile_row_offset = jnp.zeros((), jnp.int32)
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),      # combined table
    ]
    extra_in = []
    if warped:
        in_specs.append(pl.BlockSpec((2, LANES), lambda i, *_: (0, 0),
                                     memory_space=pltpu.VMEM))
        extra_in.append(warped_bounds.astype(jnp.float32).view(jnp.int32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=tuple(
            pl.BlockSpec((1, BLK_SUB, LANES), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(1 + n_aux)),
        scratch_shapes=[
            pltpu.VMEM((DMA_DEPTH, 2 + has_mask + n_aux, WIN_ROWS, LANES),
                       jnp.int32),
            pltpu.SemaphoreType.DMA((DMA_DEPTH,)),
        ],
    )
    kernel = functools.partial(_expand_kernel, tiles_x=tiles_x, n_aux=n_aux,
                               fused_depth16=fused_depth16,
                               exact_mode=exact_mode, warped=warped,
                               tile_w=tile_w,
                               tile_h=tile_h, alpha_threshold=alpha_threshold,
                               has_mask=has_mask, key_plan=key_plan)
    outs = pl.pallas_call(
        kernel,
        out_shape=tuple(
            jax.ShapeDtypeStruct((n_blocks, BLK_SUB, LANES), jnp.uint32)
            for _ in range(1 + n_aux)),
        grid_spec=grid_spec,
        interpret=interpret,
    )(block_r0, total.reshape(1),
      tile_row_offset.reshape(1).astype(jnp.int32), tab, *extra_in)
    return tuple(o.reshape(c) for o in outs) + (total, overflow)


def expand_slots_xla(counts, rect_word, aux_words, *, capacity: int,
                     tiles_x: int, fused_depth16: bool = False,
                     exact_test=False, tile_w: int = 16,
                     tile_h: int = 16, alpha_threshold: float = 0.005,
                     tile_row_offset=None, warped_bounds=None,
                     tile_mask=None, key_plan=None):
    """Pure-XLA mirror of :func:`expand_slots_pallas` (oracle + CPU fallback)."""
    from ..ops.binning import build_slot_map

    sm = build_slot_map(counts, capacity)
    rank = jnp.clip(sm.rank, 0, rect_word.shape[0] - 1)
    rect = rect_word[rank]
    min_tx = (rect & jnp.uint32(0x3FF)).astype(jnp.int32)
    min_ty = ((rect >> 10) & jnp.uint32(0x3FF)).astype(jnp.int32)
    rect_w = jnp.maximum(((rect >> 20) & jnp.uint32(0x3FF)).astype(jnp.int32), 1)
    culled = (rect & jnp.uint32(CULLED_BIT)) != 0

    q = sm.j // rect_w
    r = sm.j - q * rect_w
    is_masked = None
    if tile_mask is not None:
        mask = tile_mask[rank]
        is_masked = (rect & jnp.uint32(MASKED_BIT)) != 0
        pbit = _nth_set_bit(mask, sm.j)
        q = jnp.where(is_masked, pbit >> 3, q)
        r = jnp.where(is_masked, pbit & 7, r)
    tile = ((min_ty + q) * tiles_x + min_tx + r).astype(jnp.uint32)

    aux_list = ([aux_words[:, k] for k in range(aux_words.shape[1])]
                if not isinstance(aux_words, (list, tuple)) else list(aux_words))
    aux = [a.astype(jnp.uint32)[rank] for a in aux_list]  # K x (C,)
    slot = jnp.arange(capacity, dtype=jnp.int32)
    dead = (slot >= sm.total) | culled
    exact_mode = ("mono" if exact_test is True
                  else exact_test if isinstance(exact_test, str) else "none")
    if exact_mode == "mono":
        rowoff = (jnp.zeros((), jnp.int32) if tile_row_offset is None
                  else tile_row_offset.astype(jnp.int32))
        t_x = (tile.astype(jnp.int32) % tiles_x)
        t_y = (tile.astype(jnp.int32) // tiles_x) + rowoff
        passes = _exact_tile_test(aux[1], aux[2], aux[3], aux[4],
                                  t_x, t_y, float(tile_w), float(tile_h),
                                  alpha_threshold)
        if is_masked is not None:
            passes = passes | is_masked
        dead = dead | ~passes
    elif exact_mode == "stereo":
        t_x = (tile.astype(jnp.int32) % tiles_x)
        t_y = (tile.astype(jnp.int32) // tiles_x)
        if warped_bounds is not None:
            bx = warped_bounds[0].astype(jnp.float32)
            by = warped_bounds[1].astype(jnp.float32)
            x0 = bx[t_x]
            x1 = bx[jnp.minimum(t_x + 1, bx.shape[0] - 1)]
            y0 = by[t_y]
            y1 = by[jnp.minimum(t_y + 1, by.shape[0] - 1)]
        else:
            x0 = t_x.astype(jnp.float32) * float(tile_w)
            x1 = x0 + float(tile_w)
            y0 = t_y.astype(jnp.float32) * float(tile_h)
            y1 = y0 + float(tile_h)
        passes = _stereo_tile_test(aux, x0, x1, y0, y1)
        if is_masked is not None and warped_bounds is None:
            # see the Pallas kernel: under the warp the mask is conservative
            # and the boundary-table test must still prune
            passes = passes | is_masked
        dead = dead | ~passes
    if key_plan is not None and not fused_depth16:
        # tie-free fused key pair (see the Pallas kernel / ops/binning.KeyPlan)
        d_hi, d_lo, idx_bits = key_plan
        dn = aux[0]
        g = rank.astype(jnp.uint32)
        key = (tile << d_hi) | (dn >> d_lo)
        key2 = ((dn & jnp.uint32((1 << d_lo) - 1)) << idx_bits) | g
        outs = [jnp.where(dead, jnp.uint32(SENTINEL), key),
                jnp.where(dead, jnp.uint32(SENTINEL), key2)]
        for a in aux[1:]:
            outs.append(jnp.where(dead, jnp.uint32(0), a))
        return tuple(outs) + (sm.total, sm.overflow)
    if fused_depth16:
        key = (tile << 16) | (aux[0] & jnp.uint32(0xFFFF))
    else:
        key = tile
    key = jnp.where(dead, jnp.uint32(SENTINEL), key)
    outs = [key]
    for a in aux:
        outs.append(jnp.where(dead, jnp.uint32(0), a))
    return tuple(outs) + (sm.total, sm.overflow)
