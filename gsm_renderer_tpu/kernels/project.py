"""Fused Pallas projection kernel: project + cull + quantize + pack in ONE
HBM pass.

TPU-native equivalent of ``depthFirstProjectCullKernel``
(DepthFirstShaders.metal:46-233).  The XLA path (ops/project.py
project_and_cull + pipelines/common.pack_record_words) measures ~3.5 ms at
the 1M/SH3 headline — ~10x the ~0.35 ms HBM speed of light — because XLA
materializes intermediate fusions and lowers the u16/f16 packing through
expensive sub-word layout conversions (scratch/projprobe.py: SH ~2.0 ms,
pack +1.6 ms).  This kernel reads the component planes + SH coefficients
once, runs the whole mathlib chain in VMEM, and emits the packed u32 record
words directly, with float16 quantization done as manual round-to-nearest-
even integer packing (Mosaic has no f16 dtype; the manual pack is
bit-identical to XLA's f32->f16 convert — verified on-chip,
scratch/projab.py).

The ONE op Mosaic cannot lower is ``atan2`` (theta of the record); the
kernel emits the normalized eigenvector (vx, vy) instead and a tiny XLA
epilogue computes theta and ORs its u16 packing into w1
(:func:`merge_theta_w1`).

Math functions come straight from mathlib (pure jnp, shape-polymorphic), so
the semantics are the reference's by construction; the cull chain, bounds
and quantization reproduce ops/project.py:project_and_cull bit-for-bit
(isfinite(theta) is implied: atan2 of the finite normalized eigenvector is
always finite, see covariance_to_theta_sigmas_c).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import mathlib as M
from ..ops.binning import pack_rect_word
from .expand import CULLED_BIT, LANES

Array = Any

BLK_SUB = 32  # gaussian rows per grid step (BLK_SUB * 128 gaussians)


class _MatView:
    """Scalar-indexable (i, j) view over a flat SMEM params ref."""

    def __init__(self, ref, base: int, ncols: int):
        self.ref, self.base, self.ncols = ref, base, ncols

    def __getitem__(self, ij):
        if isinstance(ij, tuple):
            i, j = ij
            return self.ref[self.base + self.ncols * i + j]
        return self.ref[self.base + ij]


def _f32_to_f16_bits(v):
    """Manual f32 -> f16 bit conversion, IEEE round-to-nearest-even.

    Bit-identical to XLA's convert (incl. subnormals via the float-add
    trick, overflow -> inf, NaN -> 0x7E00).  Integer/float ops only — no f16
    dtype (Mosaic does not support it)."""
    bits = v.view(jnp.uint32) if hasattr(v, "view") else v
    sign = (bits >> 16) & jnp.uint32(0x8000)
    f = bits & jnp.uint32(0x7FFFFFFF)

    is_nan = f > jnp.uint32(0x7F800000)
    is_big = f >= jnp.uint32(0x47800000)  # >= 65536.0 -> inf (rounding below
    #                                       handles [65520, 65536) via carry)
    big = jnp.where(is_nan, jnp.uint32(0x7E00), jnp.uint32(0x7C00))

    is_small = f < jnp.uint32(113 << 23)  # < 2^-14 -> f16 subnormal / zero
    # subnormal: add 0.5f (ulp 2^-24 = the f16 subnormal unit) — the FPU's
    # RNE performs the rounding; subtract the 0.5f bit pattern
    fv = f.view(jnp.float32)
    sub = (fv + jnp.float32(0.5)).view(jnp.uint32) - jnp.uint32(0x3F000000)

    # normal: re-bias exponent and round mantissa to 10 bits (ties-to-even
    # via the odd-mantissa increment); carry naturally promotes to inf
    mant_odd = (f >> 13) & jnp.uint32(1)
    fn = f + jnp.uint32((((15 - 127) << 23) + 0xFFF) & 0xFFFFFFFF) + mant_odd
    h = jnp.where(is_small, sub, fn >> 13)
    h = jnp.where(is_big, big, h)
    return (sign | h) & jnp.uint32(0xFFFF)


def _sortable_uint(depth):
    bits = depth.view(jnp.uint32)
    mask = jnp.where(bits & jnp.uint32(0x80000000),
                     jnp.uint32(0xFFFFFFFF), jnp.uint32(0x80000000))
    return bits ^ mask


def _project_kernel(params_ref, *refs, n: int, width: int, height: int,
                    tile_w: int, tile_h: int, sh_degree: int,
                    near_plane: float, far_plane: float,
                    alpha_threshold: float, total_ink_threshold: float,
                    input_is_srgb: bool, near_key: int, span: int,
                    culled_dsw: int, depth_key16: bool = False):
    (comp_r, harm_r,
     rw_o, rh_o, dsw_o, w0_o, w1_o, w2_o, w3_o, vx_o, vy_o) = refs
    f32 = jnp.float32
    tiles_x, tiles_y = -(-width // tile_w), -(-height // tile_h)
    view = _MatView(params_ref, 0, 4)
    proj = _MatView(params_ref, 16, 4)
    center = _MatView(params_ref, 32, 1)

    px, py, pz = comp_r[0], comp_r[1], comp_r[2]
    sx, sy, sz = comp_r[3], comp_r[4], comp_r[5]
    opacity = comp_r[10]

    # Cull chain — formula-for-formula ops/project.py:project_and_cull
    alive = ~M.cull_by_scale_c(sx, sy, sz)
    vx, vy, vz, nx, ny, depth, in_front = M.project_points_c(
        px, py, pz, view, proj, near_plane)
    alive &= in_front
    alive &= ~M.cull_by_far_plane(depth, far_plane)
    screen_x = (nx + 1.0) * (0.5 * width)
    screen_y = (ny + 1.0) * (0.5 * height)
    alive &= opacity >= alpha_threshold

    c3d = M.build_covariance_3d_c(sx, sy, sz, comp_r[6], comp_r[7],
                                  comp_r[8], comp_r[9])
    ca, cb, cd = M.project_covariance_2d_c(c3d, vx, vy, vz, view, proj,
                                           float(width), float(height))
    ca, cb, cd = M.stabilize_covariance_2d_c(ca, cb, cd, float(width),
                                             float(height))

    # covariance_to_theta_sigmas_c minus the atan2 (theta is computed by the
    # XLA epilogue from the normalized eigenvector; isfinite(theta) is
    # implied for finite (evx, evy))
    a = jnp.maximum(ca, 1e-8)
    d = jnp.maximum(cd, 1e-8)
    b = cb
    finite = jnp.isfinite(a) & jnp.isfinite(b) & jnp.isfinite(d)
    det = a * d - b * b
    eig_ok = finite & jnp.isfinite(det) & (det > 0.0)
    mid = 0.5 * (a + d)
    disc = jnp.maximum(mid * mid - det, 0.0)
    sqrt_disc = jnp.sqrt(disc)
    lam1 = jnp.maximum(mid + sqrt_disc, 1e-8)
    lam2 = jnp.maximum(mid - sqrt_disc, 1e-8)
    use_b = jnp.abs(b) > 1e-8
    evx = jnp.where(use_b, b, jnp.where(a >= d, 1.0, 0.0))
    evy = jnp.where(use_b, lam1 - a, jnp.where(a >= d, 0.0, 1.0))
    vlen = jnp.sqrt(evx * evx + evy * evy)
    evx = evx / jnp.maximum(vlen, 1e-12)
    evy = evy / jnp.maximum(vlen, 1e-12)
    sigma1 = jnp.sqrt(lam1)
    sigma2 = jnp.sqrt(lam2)
    eig_ok = eig_ok & jnp.isfinite(sigma1) & jnp.isfinite(sigma2)
    alive &= eig_ok

    radius = 3.0 * jnp.maximum(sigma1, sigma2)
    alive &= ~M.cull_by_radius(radius)

    det2d = ca * cd - cb * cb
    alive &= ~M.cull_by_total_ink(opacity, det2d, depth, near_plane,
                                  far_plane, total_ink_threshold)

    obb_x, obb_y = M.compute_obb_extents_c(ca, cb, cd, 3.0)
    alive &= ~M.cull_by_screen_bounds_c(screen_x, screen_y, obb_x, obb_y,
                                        float(width), float(height))

    # SH color (compute_sh_color_c inlined over the coefficient-plane ref)
    n_coeffs = (sh_degree + 1) ** 2
    if sh_degree == 0:
        color = [harm_r[ch * n_coeffs] * M.SH_C0 for ch in range(3)]
    else:
        dx = center[0] - px
        dy = center[1] - py
        dz = center[2] - pz
        inv = jax.lax.rsqrt(jnp.maximum(dx * dx + dy * dy + dz * dz, 1e-24))
        basis = M.sh_basis_c(dx * inv, dy * inv, dz * inv, sh_degree)
        color = []
        for ch in range(3):
            acc = harm_r[ch * n_coeffs] * basis[0]
            for c in range(1, n_coeffs):
                acc = acc + harm_r[ch * n_coeffs + c] * basis[c]
            color.append(acc)
    color = [jnp.maximum(c + 0.5, 0.0) for c in color]
    if input_is_srgb:
        color = [jnp.where(c <= 0.04045, c / 12.92,
                           jnp.power((jnp.clip(c, 0.0, 1.0) + 0.055) / 1.055,
                                     2.4))
                 for c in (jnp.clip(c, 0.0, 1.0) for c in color)]

    # Quantized record words (pack_record_words layout); theta (w1 low u16)
    # is merged by the epilogue
    mean_x16 = _f32_to_f16_bits(screen_x)
    mean_y16 = _f32_to_f16_bits(screen_y)
    sigma1_16 = _f32_to_f16_bits(sigma1)
    sigma2_16 = _f32_to_f16_bits(sigma2)
    depth16 = _f32_to_f16_bits(depth)
    w0 = mean_x16 | (mean_y16 << 16)
    w1 = sigma1_16 << 16
    w2 = sigma2_16 | (depth16 << 16)

    def u8(c):
        return jnp.clip(c * 255.0, 0.0, 255.0).astype(jnp.int32).astype(
            jnp.uint32)

    op_u8 = u8(opacity)
    w3 = u8(color[0]) | (u8(color[1]) << 8) | (u8(color[2]) << 16) \
        | (op_u8 << 24)

    # Tile rect + d2 cutoff from the quantized opacity
    min_tx, max_tx, min_ty, max_ty = M.compute_tile_bounds_c(
        screen_x, screen_y, obb_x, obb_y, float(width), float(height),
        tile_w, tile_h, tiles_x, tiles_y)
    alive &= (min_tx <= max_tx) & (min_ty <= max_ty)

    opacity_q = op_u8.astype(jnp.int32).astype(f32) * (1.0 / 255.0)
    tau = max(alpha_threshold, 1e-12)
    d2_cutoff = M.compute_d2_cutoff(opacity_q, tau)
    alive &= d2_cutoff >= 0.0

    min_tx = jnp.where(alive, min_tx, 0)
    min_ty = jnp.where(alive, min_ty, 0)
    rect_w = jnp.where(alive, max_tx - min_tx + 1, 1)
    rect_h = jnp.where(alive, max_ty - min_ty + 1, 1)

    # sortable depth key, KeyPlan-normalized (ops/binning.KeyPlan.normalize)
    if depth_key16:
        # mathlib.half_depth_key16 over the already-quantized f16 depth bits
        # (the Global/Local fused [tile:16 | depth16:16] configuration)
        sign16 = depth16 & jnp.uint32(0x8000)
        dk16 = jnp.where(sign16 != 0, (~depth16) & jnp.uint32(0xFFFF),
                         depth16 ^ jnp.uint32(0x8000))
        dsw = jnp.where(alive, dk16, jnp.uint32(0xFFFFFFFF))
        dkey = dsw
    else:
        dkey = jnp.where(alive, _sortable_uint(depth), jnp.uint32(0xFFFFFFFF))
    if depth_key16:
        pass
    elif near_key is not None:
        # KeyPlan.normalize via compare+select (Mosaic cannot legalize
        # unsigned max/min on this chip)
        nk = jnp.uint32(near_key)
        sp = jnp.uint32(span)
        d = jnp.where(dkey > nk, dkey, nk) - nk
        dsw = jnp.where(d < sp, d, sp)
        dsw = jnp.where(alive, dsw, jnp.uint32(culled_dsw))
    else:
        dsw = dkey

    rw = pack_rect_word(min_tx, min_ty, rect_w)
    rw = jnp.where(alive, rw, rw | jnp.uint32(CULLED_BIT))

    rw_o[...] = rw.view(jnp.int32)
    rh_o[...] = rect_h
    dsw_o[...] = dsw.view(jnp.int32)
    w0_o[...] = w0.view(jnp.int32)
    w1_o[...] = w1.view(jnp.int32)
    w2_o[...] = w2.view(jnp.int32)
    w3_o[...] = w3.view(jnp.int32)
    vx_o[...] = evx
    vy_o[...] = evy


def prepare_projection_inputs(gi, sh_degree: int):
    """Frame-invariant device layout for :func:`project_and_cull_packed`:
    the component planes and SH coefficient planes reshaped/padded to the
    kernel's (rows, 128) block layout.

    The pad+slice prologue costs ~0.6-0.8 ms at 1M/SH3 (a ~190 MB harmonics
    copy) if done per frame; the inputs never change between frames, so the
    renderer computes this ONCE per input and caches it on the GaussianInput
    (the TPU analogue of the reference uploading packed MTLBuffers once —
    GaussianInput docstring, GaussianRendererProtocol.swift:9-26).
    Returns (comp (11, rows, 128) f32, harm (3 * n_coeffs, rows, 128) f32).
    """
    n = gi.count
    f32 = jnp.float32
    rows = -(-n // LANES)
    grid = -(-rows // BLK_SUB)
    rows_pad = grid * BLK_SUB

    def prep(x):
        x = x.astype(f32).reshape(-1)
        return jnp.pad(x, (0, rows_pad * LANES - n)).reshape(rows_pad, LANES)

    comp = jnp.stack([
        prep(gi.positions[..., 0]), prep(gi.positions[..., 1]),
        prep(gi.positions[..., 2]),
        prep(gi.scales[..., 0]), prep(gi.scales[..., 1]),
        prep(gi.scales[..., 2]),
        prep(gi.rotations[..., 0]), prep(gi.rotations[..., 1]),
        prep(gi.rotations[..., 2]), prep(gi.rotations[..., 3]),
        prep(gi.opacities)])
    n_coeffs = (sh_degree + 1) ** 2
    harm = gi.harmonics[:, :n_coeffs, :].astype(f32).reshape(3 * n_coeffs, n)
    harm = jnp.pad(harm, ((0, 0), (0, rows_pad * LANES - n)))
    harm = harm.reshape(3 * n_coeffs, rows_pad, LANES)
    return comp, harm


def cached_projection_inputs(gi, sh_degree: int):
    """Per-input cache of :func:`prepare_projection_inputs` (keyed on the
    SH degree; stored on the GaussianInput object like the foveated warp
    tables are stored on their target)."""
    cache = gi.__dict__.setdefault("_proj_prep", {})
    got = cache.get(sh_degree)
    if got is None:
        got = prepare_projection_inputs(gi, sh_degree)
        cache[sh_degree] = got
    return got


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PackedProjection:
    """Per-gaussian packed projection outputs, prep-kernel-ready.

    ``rect_word``: packed (min_tx | min_ty | rect_w) u32 with CULLED_BIT set
    for invisible gaussians; ``rect_h``: i32; ``dsw``: plan-normalized u32
    depth word (raw sortable key when no plan); ``words``: the 4 record u32
    words (theta already merged into w1); ``visible``: bool.
    """

    rect_word: Array
    rect_h: Array
    dsw: Array
    words: list
    visible: Array


def project_and_cull_packed(
    gi, view: Array, proj: Array, center: Array, *,
    width: int, height: int, tile_w: int, tile_h: int,
    sh_degree: int, near_plane: float, far_plane: float,
    alpha_threshold: float, total_ink_threshold: float,
    input_is_srgb: bool, key_plan=None,
    interpret: bool = False,
    prepared=None,
    depth_key16: bool = False,
) -> PackedProjection:
    """Fused projection for the production mono path (see module docstring).

    ``key_plan``: ops/binning.KeyPlan or None; when given, ``dsw`` is the
    plan-normalized depth word (culled gaussians saturate at the span like
    KeyPlan.normalize of 0xFFFFFFFF).
    ``depth_key16``: emit the fused 16-bit half-depth key
    (mathlib.half_depth_key16 — the Global/Local [tile:16 | depth16:16]
    configuration) instead of the 32-bit sortable key.
    ``prepared``: optional (comp, harm) from
    :func:`prepare_projection_inputs` — pass the per-input cached layout to
    keep the pad/slice prologue out of the frame program.
    """
    n = gi.count
    f32 = jnp.float32
    rows = -(-n // LANES)
    grid = -(-rows // BLK_SUB)
    rows_pad = grid * BLK_SUB

    if prepared is not None:
        comp, harm = prepared
    else:
        comp, harm = prepare_projection_inputs(gi, sh_degree)
    n_coeffs = (sh_degree + 1) ** 2

    params = jnp.concatenate([
        view.astype(f32).reshape(-1), proj.astype(f32).reshape(-1),
        center.astype(f32).reshape(-1)])

    near_key = span = None
    culled_dsw = 0
    if key_plan is not None:
        near_key, span = key_plan.near_key, key_plan.span
        # KeyPlan.normalize(0xFFFFFFFF) == span (saturating)
        culled_dsw = span

    kernel = functools.partial(
        _project_kernel, n=n, width=width, height=height, tile_w=tile_w,
        tile_h=tile_h, sh_degree=sh_degree, near_plane=near_plane,
        far_plane=far_plane, alpha_threshold=alpha_threshold,
        total_ink_threshold=total_ink_threshold,
        input_is_srgb=input_is_srgb, near_key=near_key, span=span,
        culled_dsw=culled_dsw, depth_key16=depth_key16)

    blk = pl.BlockSpec((BLK_SUB, LANES), lambda i: (i, 0))
    out_i32 = jax.ShapeDtypeStruct((rows_pad, LANES), jnp.int32)
    out_f32 = jax.ShapeDtypeStruct((rows_pad, LANES), jnp.float32)
    outs = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((11, BLK_SUB, LANES), lambda i: (0, i, 0)),
                  pl.BlockSpec((3 * n_coeffs, BLK_SUB, LANES),
                               lambda i: (0, i, 0))],
        out_specs=[blk] * 9,
        out_shape=[out_i32] * 7 + [out_f32] * 2,
        interpret=interpret,
    )(params, comp, harm)

    rw, rh, dsw, w0, w1, w2, w3, evx, evy = outs

    def flat(x, dtype):
        return x.reshape(-1)[:n].view(dtype)

    rect_word = flat(rw, jnp.uint32)
    # theta epilogue: atan2 is the one op Mosaic cannot lower
    # (pack_theta_u16 semantics; u16 packing kept in i32 to avoid XLA's
    # sub-word layout conversions — scratch/projprobe.py "pack" receipt)
    # exact op chain of covariance_to_theta_sigmas_c then pack_theta_u16
    theta = jnp.arctan2(flat(evy, jnp.float32), flat(evx, jnp.float32))
    theta = jnp.mod(theta, M.PI)
    theta = jnp.where(theta >= M.PI, theta - M.PI, theta)
    t = jnp.mod(theta, M.PI)
    t = jnp.where(t < 0.0, t + M.PI, t)
    theta_u = jnp.clip(t * (65535.0 / M.PI) + 0.5, 0.0, 65535.0).astype(
        jnp.int32).astype(jnp.uint32)
    w1_full = flat(w1, jnp.uint32) | theta_u

    return PackedProjection(
        rect_word=rect_word,
        rect_h=flat(rh, jnp.int32),
        dsw=flat(dsw, jnp.uint32),
        words=[flat(w0, jnp.uint32), w1_full, flat(w2, jnp.uint32),
               flat(w3, jnp.uint32)],
        visible=(rect_word & jnp.uint32(CULLED_BIT)) == 0,
    )


# ---------------------------------------------------------------------------
# Dual-eye (stereo) fused projection
# ---------------------------------------------------------------------------

def _eye_chain(px, py, pz, view, proj, width, height, tile_w, tile_h,
               near_plane, far_plane, c3d):
    """Eye-dependent projection chain — formula-for-formula
    ops/project._project_one_eye (minus the atan2: the normalized
    eigenvector is emitted for the XLA theta epilogue)."""
    tiles_x, tiles_y = -(-width // tile_w), -(-height // tile_h)
    vx, vy, vz, nx, ny, depth, in_front = M.project_points_c(
        px, py, pz, view, proj, near_plane)
    ok = in_front & ~M.cull_by_far_plane(depth, far_plane)
    screen_x = (nx + 1.0) * (0.5 * width)
    screen_y = (ny + 1.0) * (0.5 * height)

    ca, cb, cd = M.project_covariance_2d_c(c3d, vx, vy, vz, view,
                                           proj, float(width), float(height))
    ca, cb, cd = M.stabilize_covariance_2d_c(ca, cb, cd, float(width),
                                             float(height))
    # covariance_to_theta_sigmas_c minus atan2
    a = jnp.maximum(ca, 1e-8)
    d = jnp.maximum(cd, 1e-8)
    b = cb
    finite = jnp.isfinite(a) & jnp.isfinite(b) & jnp.isfinite(d)
    det = a * d - b * b
    eig_ok = finite & jnp.isfinite(det) & (det > 0.0)
    mid = 0.5 * (a + d)
    disc = jnp.maximum(mid * mid - det, 0.0)
    sqrt_disc = jnp.sqrt(disc)
    lam1 = jnp.maximum(mid + sqrt_disc, 1e-8)
    lam2 = jnp.maximum(mid - sqrt_disc, 1e-8)
    use_b = jnp.abs(b) > 1e-8
    evx = jnp.where(use_b, b, jnp.where(a >= d, 1.0, 0.0))
    evy = jnp.where(use_b, lam1 - a, jnp.where(a >= d, 0.0, 1.0))
    vlen = jnp.sqrt(evx * evx + evy * evy)
    evx = evx / jnp.maximum(vlen, 1e-12)
    evy = evy / jnp.maximum(vlen, 1e-12)
    sigma1 = jnp.sqrt(lam1)
    sigma2 = jnp.sqrt(lam2)
    eig_ok = eig_ok & jnp.isfinite(sigma1) & jnp.isfinite(sigma2)
    ok &= eig_ok
    det2d = ca * cd - cb * cb

    radius = 3.0 * jnp.maximum(sigma1, sigma2)
    ok &= ~M.cull_by_radius(radius)
    obb_x, obb_y = M.compute_obb_extents_c(ca, cb, cd, 3.0)
    ok &= ~M.cull_by_screen_bounds_c(screen_x, screen_y, obb_x, obb_y,
                                     float(width), float(height))
    min_tx, max_tx, min_ty, max_ty = M.compute_tile_bounds_c(
        screen_x, screen_y, obb_x, obb_y, float(width), float(height),
        tile_w, tile_h, tiles_x, tiles_y)
    ok &= (min_tx <= max_tx) & (min_ty <= max_ty)
    return dict(screen_x=screen_x, screen_y=screen_y, depth=depth,
                evx=evx, evy=evy, sigma1=sigma1, sigma2=sigma2, det=det2d,
                visible=ok, min_tx=min_tx, max_tx=max_tx, min_ty=min_ty,
                max_ty=max_ty,
                px_min=jnp.clip(screen_x - obb_x, 0.0, float(width)),
                px_max=jnp.clip(screen_x + obb_x, 0.0, float(width)),
                py_min=jnp.clip(screen_y - obb_y, 0.0, float(height)),
                py_max=jnp.clip(screen_y + obb_y, 0.0, float(height)))


def _stereo_project_kernel(params_ref, *refs, width: int, height: int,
                           tile_w: int, tile_h: int, sh_degree: int,
                           near_plane: float, far_plane: float,
                           alpha_threshold: float,
                           total_ink_threshold: float,
                           input_is_srgb: bool, near_key: int, span: int,
                           culled_dsw: int):
    (comp_r, harm_r,
     rw_o, rh_o, dsw_o, vis_o,
     w0l_o, w1l_o, w2l_o, w3_o, w0r_o, w1r_o, w2r_o,
     evxl_o, evyl_o, evxr_o, evyr_o,
     pxmin_o, pxmax_o, pymin_o, pymax_o) = refs
    f32 = jnp.float32
    # params: views(2x16) projs(2x16) centers(2x3) st(16) scene_scale mid(3)
    views = [_MatView(params_ref, 0, 4), _MatView(params_ref, 16, 4)]
    projs = [_MatView(params_ref, 32, 4), _MatView(params_ref, 48, 4)]
    st = _MatView(params_ref, 70, 4)
    scene_scale = params_ref[86]
    mid = _MatView(params_ref, 87, 1)

    px0, py0, pz0 = comp_r[0], comp_r[1], comp_r[2]
    sx, sy, sz = comp_r[3], comp_r[4], comp_r[5]
    opacity = comp_r[10]

    shared_ok = ~M.cull_by_scale_c(sx, sy, sz)
    shared_ok &= opacity >= alpha_threshold

    px, py, pz, _w = M.apply_mat4_c(st, px0, py0, pz0)
    c3d = M.build_covariance_3d_c(sx * scene_scale, sy * scene_scale,
                                  sz * scene_scale,
                                  comp_r[6], comp_r[7], comp_r[8], comp_r[9])

    eyes = [_eye_chain(px, py, pz, views[i], projs[i], width, height,
                       tile_w, tile_h, near_plane, far_plane, c3d)
            for i in range(2)]

    vis_l = eyes[0]["visible"] & shared_ok
    vis_r = eyes[1]["visible"] & shared_ok
    any_vis = vis_l | vis_r

    depth_l, depth_r = eyes[0]["depth"], eyes[1]["depth"]
    both = vis_l & vis_r
    check_depth = jnp.where(both, 0.5 * (depth_l + depth_r),
                            jnp.where(vis_l, depth_l, depth_r))
    det = jnp.where(both, jnp.maximum(eyes[0]["det"], eyes[1]["det"]),
                    jnp.where(vis_l, eyes[0]["det"], eyes[1]["det"]))
    any_vis &= ~M.cull_by_total_ink(opacity, det, check_depth, near_plane,
                                    far_plane, total_ink_threshold)

    # SH color at the mid camera
    n_coeffs = (sh_degree + 1) ** 2
    if sh_degree == 0:
        color = [harm_r[ch * n_coeffs] * M.SH_C0 for ch in range(3)]
    else:
        dx = mid[0] - px
        dy = mid[1] - py
        dz = mid[2] - pz
        inv = jax.lax.rsqrt(jnp.maximum(dx * dx + dy * dy + dz * dz, 1e-24))
        basis = M.sh_basis_c(dx * inv, dy * inv, dz * inv, sh_degree)
        color = []
        for ch in range(3):
            acc = harm_r[ch * n_coeffs] * basis[0]
            for c in range(1, n_coeffs):
                acc = acc + harm_r[ch * n_coeffs + c] * basis[c]
            color.append(acc)
    color = [jnp.maximum(c + 0.5, 0.0) for c in color]
    if input_is_srgb:
        color = [jnp.where(c <= 0.04045, c / 12.92,
                           jnp.power((jnp.clip(c, 0.0, 1.0) + 0.055) / 1.055,
                                     2.4))
                 for c in (jnp.clip(c, 0.0, 1.0) for c in color)]

    def u8(c):
        return jnp.clip(c * 255.0, 0.0, 255.0).astype(jnp.int32).astype(
            jnp.uint32)

    op_u8 = u8(opacity)
    w3 = u8(color[0]) | (u8(color[1]) << 8) | (u8(color[2]) << 16) \
        | (op_u8 << 24)

    # union tile bounds + pixel bounds over visible eyes
    big = 1 << 20

    def pick(key, vl, vr, reduce_min, bigf=None):
        a, b = eyes[0][key], eyes[1][key]
        bf = big if bigf is None else bigf
        if reduce_min:
            a = jnp.where(vl, a, bf if bigf is None else jnp.float32(bf))
            b = jnp.where(vr, b, bf if bigf is None else jnp.float32(bf))
            return jnp.minimum(a, b)
        a = jnp.where(vl, a, -bf if bigf is None else jnp.float32(-bf))
        b = jnp.where(vr, b, -bf if bigf is None else jnp.float32(-bf))
        return jnp.maximum(a, b)

    min_tx = pick("min_tx", vis_l, vis_r, True)
    max_tx = pick("max_tx", vis_l, vis_r, False)
    min_ty = pick("min_ty", vis_l, vis_r, True)
    max_ty = pick("max_ty", vis_l, vis_r, False)
    px_min = pick("px_min", vis_l, vis_r, True, bigf=float(big))
    px_max = pick("px_max", vis_l, vis_r, False, bigf=float(big))
    py_min = pick("py_min", vis_l, vis_r, True, bigf=float(big))
    py_max = pick("py_max", vis_l, vis_r, False, bigf=float(big))
    rect_ok = (min_tx <= max_tx) & (min_ty <= max_ty)
    any_vis &= rect_ok

    # per-eye record words (eye_record semantics: invisible eye's mean is
    # replaced with the largest finite off-screen offset so alpha underflows
    # to exactly 0 — ops/project.py:405-426)
    def eye_words(i, vis):
        e = eyes[i]
        mx = _f32_to_f16_bits(jnp.where(vis, e["screen_x"], -6e4))
        my = _f32_to_f16_bits(jnp.where(vis, e["screen_y"], -6e4))
        s1 = _f32_to_f16_bits(jnp.where(vis, e["sigma1"], 1.0))
        s2 = _f32_to_f16_bits(jnp.where(vis, e["sigma2"], 1.0))
        dp = _f32_to_f16_bits(jnp.where(vis, e["depth"], 0.0))
        return mx | (my << 16), s1 << 16, s2 | (dp << 16)

    w0l, w1l, w2l = eye_words(0, vis_l)
    w0r, w1r, w2r = eye_words(1, vis_r)

    dkey = jnp.where(any_vis, _sortable_uint(check_depth),
                     jnp.uint32(0xFFFFFFFF))
    if near_key is not None:
        nk = jnp.uint32(near_key)
        sp = jnp.uint32(span)
        dd = jnp.where(dkey > nk, dkey, nk) - nk
        dsw = jnp.where(dd < sp, dd, sp)
        dsw = jnp.where(any_vis, dsw, jnp.uint32(culled_dsw))
    else:
        dsw = dkey

    min_tx_c = jnp.where(any_vis, min_tx, 0)
    min_ty_c = jnp.where(any_vis, min_ty, 0)
    rect_w = jnp.where(any_vis, max_tx - min_tx_c + 1, 1)
    rect_h = jnp.where(any_vis, max_ty - min_ty_c + 1, 1)
    rw = pack_rect_word(min_tx_c, min_ty_c, rect_w)
    rw = jnp.where(any_vis, rw, rw | jnp.uint32(CULLED_BIT))

    rw_o[...] = rw.view(jnp.int32)
    rh_o[...] = rect_h
    dsw_o[...] = dsw.view(jnp.int32)
    vis_o[...] = (vis_l.astype(jnp.int32) | (vis_r.astype(jnp.int32) << 1)
                  | (any_vis.astype(jnp.int32) << 2))
    w0l_o[...] = w0l.view(jnp.int32)
    w1l_o[...] = w1l.view(jnp.int32)
    w2l_o[...] = w2l.view(jnp.int32)
    w3_o[...] = w3.view(jnp.int32)
    w0r_o[...] = w0r.view(jnp.int32)
    w1r_o[...] = w1r.view(jnp.int32)
    w2r_o[...] = w2r.view(jnp.int32)
    evxl_o[...] = eyes[0]["evx"]
    evyl_o[...] = eyes[0]["evy"]
    evxr_o[...] = eyes[1]["evx"]
    evyr_o[...] = eyes[1]["evy"]
    pxmin_o[...] = jnp.where(any_vis, px_min, 0.0)
    pxmax_o[...] = jnp.where(any_vis, px_max, 0.0)
    pymin_o[...] = jnp.where(any_vis, py_min, 0.0)
    pymax_o[...] = jnp.where(any_vis, py_max, 0.0)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class StereoPackedProjection:
    """Dual-eye packed projection outputs (prep-kernel-ready): union rect
    word (CULLED_BIT for invisible), rect_h, plan-normalized depth word,
    8 record words (left w0..w3, right w0..w3 — w3 shared), visibility, and
    the union PIXEL bounds the foveated re-binning consumes."""

    rect_word: Array
    rect_h: Array
    dsw: Array
    words: list
    visible: Array
    px_min: Array
    px_max: Array
    py_min: Array
    py_max: Array


def stereo_project_and_cull_packed(
    gi, views: Array, projs: Array, centers: Array, scene_transform: Array,
    *,
    width: int, height: int, tile_w: int, tile_h: int,
    sh_degree: int, near_plane: float, far_plane: float,
    alpha_threshold: float, total_ink_threshold: float,
    input_is_srgb: bool, key_plan=None,
    interpret: bool = False,
    prepared=None,
) -> StereoPackedProjection:
    """Fused dual-eye projection (stereo_project_and_cull + both eyes'
    pack_record_words in one HBM pass); see :func:`project_and_cull_packed`."""
    n = gi.count
    f32 = jnp.float32
    rows = -(-n // LANES)
    grid = -(-rows // BLK_SUB)
    rows_pad = grid * BLK_SUB

    if prepared is not None:
        comp, harm = prepared
    else:
        comp, harm = prepare_projection_inputs(gi, sh_degree)
    n_coeffs = (sh_degree + 1) ** 2

    st = scene_transform.astype(f32)
    scene_scale = jnp.linalg.norm(st[:3, 0])
    mid = 0.5 * (centers[0] + centers[1]).astype(f32)
    params = jnp.concatenate([
        views.astype(f32).reshape(-1), projs.astype(f32).reshape(-1),
        centers.astype(f32).reshape(-1), st.reshape(-1),
        scene_scale.reshape(1), mid.reshape(-1)])

    near_key = span = None
    culled_dsw = 0
    if key_plan is not None:
        near_key, span = key_plan.near_key, key_plan.span
        culled_dsw = span

    kernel = functools.partial(
        _stereo_project_kernel, width=width, height=height, tile_w=tile_w,
        tile_h=tile_h, sh_degree=sh_degree, near_plane=near_plane,
        far_plane=far_plane, alpha_threshold=alpha_threshold,
        total_ink_threshold=total_ink_threshold,
        input_is_srgb=input_is_srgb, near_key=near_key, span=span,
        culled_dsw=culled_dsw)

    blk = pl.BlockSpec((BLK_SUB, LANES), lambda i: (i, 0))
    out_i32 = jax.ShapeDtypeStruct((rows_pad, LANES), jnp.int32)
    out_f32 = jax.ShapeDtypeStruct((rows_pad, LANES), jnp.float32)
    outs = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((11, BLK_SUB, LANES), lambda i: (0, i, 0)),
                  pl.BlockSpec((3 * n_coeffs, BLK_SUB, LANES),
                               lambda i: (0, i, 0))],
        out_specs=[blk] * 19,
        out_shape=[out_i32] * 11 + [out_f32] * 8,
        interpret=interpret,
    )(params, comp, harm)

    (rw, rh, dsw, vis, w0l, w1l, w2l, w3, w0r, w1r, w2r,
     evxl, evyl, evxr, evyr, pxmin, pxmax, pymin, pymax) = outs

    def flat(x, dtype):
        return x.reshape(-1)[:n].view(dtype)

    vis_bits = flat(vis, jnp.int32)
    vis_l = (vis_bits & 1) != 0
    vis_r = (vis_bits & 2) != 0

    def theta_u16(evx, evy, v):
        # exact op chain: covariance_to_theta_sigmas_c -> where(vis, ., 0)
        # -> pack_theta_u16 (atan2 is the one op Mosaic cannot lower)
        t = jnp.arctan2(flat(evy, jnp.float32), flat(evx, jnp.float32))
        t = jnp.mod(t, M.PI)
        t = jnp.where(t >= M.PI, t - M.PI, t)
        t = jnp.where(v, t, 0.0)
        t = jnp.mod(t, M.PI)
        t = jnp.where(t < 0.0, t + M.PI, t)
        return jnp.clip(t * (65535.0 / M.PI) + 0.5, 0.0, 65535.0).astype(
            jnp.int32).astype(jnp.uint32)

    w1l_full = flat(w1l, jnp.uint32) | theta_u16(evxl, evyl, vis_l)
    w1r_full = flat(w1r, jnp.uint32) | theta_u16(evxr, evyr, vis_r)
    w3f = flat(w3, jnp.uint32)

    rect_word = flat(rw, jnp.uint32)
    return StereoPackedProjection(
        rect_word=rect_word,
        rect_h=flat(rh, jnp.int32),
        dsw=flat(dsw, jnp.uint32),
        words=[flat(w0l, jnp.uint32), w1l_full, flat(w2l, jnp.uint32), w3f,
               flat(w0r, jnp.uint32), w1r_full, flat(w2r, jnp.uint32), w3f],
        visible=(vis_bits & 4) != 0,
        px_min=flat(pxmin, jnp.float32),
        px_max=flat(pxmax, jnp.float32),
        py_min=flat(pymin, jnp.float32),
        py_max=flat(pymax, jnp.float32),
    )
