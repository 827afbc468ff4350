"""Shared pipeline machinery: record word packing, sorted-instance attribute
derivation (including the exact per-tile ellipse test), and the core frame
assembly used by every renderer variant."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from .. import mathlib as M
from ..types import RenderRecord

Array = Any


def pack_record_words(record: RenderRecord):
    """Pack the quantized render record into (N, 4) uint32 words — the SoA
    equivalent of the 16-byte ``GaussianRenderData`` (BridgingTypes.h:75-84):

      word0 = mean_x.f16 | mean_y.f16 << 16
      word1 = theta.u16  | sigma1.f16 << 16
      word2 = sigma2.f16 | depth.f16 << 16
      word3 = r | g << 8 | b << 16 | opacity << 24
    """
    def f16b(x):
        return x.view(jnp.uint16).astype(jnp.uint32)

    w0 = f16b(record.mean_x) | (f16b(record.mean_y) << 16)
    w1 = record.theta.astype(jnp.uint32) | (f16b(record.sigma1) << 16)
    w2 = f16b(record.sigma2) | (f16b(record.depth) << 16)
    w3 = (record.color[:, 0].astype(jnp.uint32)
          | (record.color[:, 1].astype(jnp.uint32) << 8)
          | (record.color[:, 2].astype(jnp.uint32) << 16)
          | (record.opacity.astype(jnp.uint32) << 24))
    return jnp.stack([w0, w1, w2, w3], axis=-1)


def unpack_record_words(words):
    """Inverse of :func:`pack_record_words`; returns a dict of f32 fields."""
    def lo16(w):
        return (w & jnp.uint32(0xFFFF)).astype(jnp.uint16)

    def hi16(w):
        return (w >> 16).astype(jnp.uint16)

    w0, w1, w2, w3 = (words[..., i] for i in range(4))
    return {
        "mean_x": lo16(w0).view(jnp.float16).astype(jnp.float32),
        "mean_y": hi16(w0).view(jnp.float16).astype(jnp.float32),
        "theta": M.unpack_theta_u16(lo16(w1)),
        "sigma1": hi16(w1).view(jnp.float16).astype(jnp.float32),
        "sigma2": lo16(w2).view(jnp.float16).astype(jnp.float32),
        "depth": hi16(w2).view(jnp.float16).astype(jnp.float32),
        "r": (w3 & 0xFF).astype(jnp.float32) * (1.0 / 255.0),
        "g": ((w3 >> 8) & 0xFF).astype(jnp.float32) * (1.0 / 255.0),
        "b": ((w3 >> 16) & 0xFF).astype(jnp.float32) * (1.0 / 255.0),
        "op": ((w3 >> 24) & 0xFF).astype(jnp.float32) * (1.0 / 255.0),
    }


def sorted_instance_attrs(sorted_words, sorted_tile_key, *, tiles_x: int,
                          tile_w: int, tile_h: int, alpha_threshold: float,
                          exact_tile_test: bool, r2_cutoff: float | None = None):
    """Blend attributes for sorted instances, with the exact per-tile ellipse test
    applied as a zero-alpha mask.

    ``sorted_words``: (C, 4) uint32 quantized records in sorted-instance order;
    ``sorted_tile_key``: (C,) uint32 tile ids (sentinel 0xFFFFFFFF for dead slots).

    The exact test reproduces the reference mono path's per-tile filter
    (DepthFirstShaders.metal:181-205): conic rebuilt from the *quantized* record,
    ``minQuadRect <= d2Cutoff`` over the tile rect relative to the quantized mean.
    Instances failing it get opacity 0 (the reference never emits them; a
    zero-alpha instance contributes identically nothing to the blend).

    ``r2_cutoff``: if set (HardwareRenderer parity: fragment discard at r^2 > 9,
    HardwareGaussianShaders.metal:771-780), skips the exact test and instead
    leaves per-pixel cutoff to the blend (no list-level mask).
    """
    f = unpack_record_words(sorted_words)
    theta, s1, s2 = f["theta"], jnp.maximum(f["sigma1"], 1e-4), jnp.maximum(f["sigma2"], 1e-4)
    c = jnp.cos(theta)
    s = jnp.sin(theta)
    inv1 = 1.0 / s1
    inv2 = 1.0 / s2
    mx, my = f["mean_x"], f["mean_y"]

    a1 = c * inv1
    b1 = s * inv1
    c1 = -(mx * c + my * s) * inv1
    a2 = -s * inv2
    b2 = c * inv2
    c2 = (mx * s - my * c) * inv2

    live = sorted_tile_key != jnp.uint32(0xFFFFFFFF)
    op = jnp.where(live, f["op"], 0.0)

    if exact_tile_test:
        # conic (A, B, C) consistent with the linear forms: q = u^2 + v^2
        conic_a = a1 * a1 + a2 * a2
        conic_b = a1 * b1 + a2 * b2
        conic_c = b1 * b1 + b2 * b2
        tile = jnp.where(live, sorted_tile_key, 0).astype(jnp.int32)
        tx = (tile % tiles_x).astype(jnp.float32)
        ty = (tile // tiles_x).astype(jnp.float32)
        xmin = tx * tile_w - mx
        xmax = xmin + tile_w
        ymin = ty * tile_h - my
        ymax = ymin + tile_h
        d2min = M.min_quad_rect(xmin, xmax, ymin, ymax, conic_a, conic_b, conic_c)
        tau = max(alpha_threshold, 1e-12)
        cutoff = M.compute_d2_cutoff(op, tau)
        op = jnp.where(d2min <= cutoff, op, 0.0)

    return {
        "a1": a1, "b1": b1, "c1": c1, "a2": a2, "b2": b2, "c2": c2,
        "r": f["r"], "g": f["g"], "b": f["b"],
        "depth": f["depth"], "op": op,
    }


def binning_inputs(visible, min_tx, min_ty, max_tx, rect_count,
                   depth_sort_word, word_list, *, exact_test=False,
                   tile_w: int = 16, tile_h: int = 16,
                   alpha_threshold: float = 0.005, precount: bool = True,
                   tile_row_offset=None, mask_override=None):
    """Per-gaussian expand inputs: (counts, rect_word, tile_mask, aux).

    When the mono exact test is on and ``precount`` holds, gaussians whose
    clamped rect fits the 8x4 mask window get exact pre-counted instance
    counts (kernels/expand.py exact_tile_masks — the reference's
    count-before-expansion discipline, DepthFirstShaders.metal:181-219);
    zero-count ones are culled outright.

    ``mask_override``: optional (mask (N,) u32, count (N,) i32, eligible (N,)
    bool) computed by the caller — used by the multichip band-sharded path,
    whose masks are built in global display space BEFORE the all-gather and
    band-shifted per device (the in-place mask predicate cannot see the band
    clamp).  Overrides the local mask computation and the rect-fits-window
    eligibility check.
    """
    from ..kernels import expand as E
    from ..ops import binning as B

    rect_w = max_tx - min_tx + 1
    rect_word = B.pack_rect_word(min_tx, min_ty, rect_w)
    counts = rect_count
    tile_mask = None
    mask = cnt = None
    eligible = None
    if mask_override is not None:
        mask, cnt, eligible = mask_override
    elif precount and tile_row_offset is None:
        rect_h = rect_count // jnp.maximum(rect_w, 1)
        if exact_test is True:
            mask, cnt = E.exact_tile_masks(
                word_list[0], word_list[1], word_list[2], word_list[3],
                min_tx, min_ty, rect_w, rect_h, tile_w, tile_h,
                alpha_threshold)
        elif exact_test == "stereo" and len(word_list) >= 8:
            # dual-eye exact pre-count over the union rect (word_list =
            # left record words 0..3, right 4..7)
            mask, cnt = E.stereo_tile_masks(
                word_list[0:3], word_list[4:7],
                min_tx, min_ty, rect_w, rect_h, tile_w, tile_h)
    if mask is not None:
        if eligible is None:
            eligible = visible & (rect_w <= E.MASK_W) & (rect_h <= E.MASK_H)
        counts = jnp.where(eligible, cnt, rect_count)
        visible = visible & (~eligible | (cnt > 0))
        rect_word = jnp.where(eligible,
                              rect_word | jnp.uint32(E.MASKED_BIT), rect_word)
        tile_mask = mask
    rect_word = jnp.where(visible, rect_word,
                          rect_word | jnp.uint32(E.CULLED_BIT))
    counts = jnp.maximum(counts, 1)
    # word LIST, not an (N, K) stack: the expand table is built plane-wise
    # ((N, K) stacks force a minor-dim transpose — CLAUDE.md gotcha)
    aux = ([depth_sort_word.astype(jnp.uint32)]
           + [w.astype(jnp.uint32) for w in word_list])
    return counts, rect_word, tile_mask, aux


def binning_sort_operands(visible, min_tx, min_ty, max_tx, rect_count,
                          depth_sort_word, word_list, *, capacity: int,
                          tiles_x: int, fused_depth16: bool, use_pallas: bool,
                          interpret: bool = False, exact_test=False,
                          tile_w: int = 16, tile_h: int = 16,
                          alpha_threshold: float = 0.005,
                          tile_row_offset=None, warped_bounds=None,
                          precount: bool = True, mask_override=None,
                          use_prep: bool | None = None, lod_min: float = 0.0,
                          key_plan=None, packed=None, row_capacity: int = 0):
    """Core fused binning UP TO the instance sort, over arbitrary carried
    word lists (mono carries the 4-word record; stereo carries 8 words =
    both eyes' records).

    ``precount``: exact-count touched tiles BEFORE slot assignment for
    gaussians whose rect fits the 8x4 mask window (the reference's
    capacity discipline — exact counting at projection lets it size
    maxInstances at 4 x maxGaussians, DepthFirstShaders.metal:181-219,
    DepthFirstResources.swift:80-81).  Applies when the mono exact test is
    on; oversized rects fall back to full-rect counting with the in-kernel
    test.

    ``key_plan``: optional ops/binning.KeyPlan — the expand kernel then emits
    the tie-free fused key pair and the tile sort runs UNSTABLE with
    bit-identical reference tie order (stable-sort machinery measured ~7% of
    the headline frame; scratch/stabframe.py + BACKLOG receipts).

    ``row_capacity``: static virtual-row capacity > 0 enables the per-row
    exact-span decomposition of oversized rects (kernels/expand.
    row_expand_pallas — near-exact instance counts for the heavy tail whose
    full-rect fallback slots dominate realistic scenes).  Mono Pallas path
    with a key plan only; the KeyPlan's index bits must then address
    ``row_capacity`` rows (callers build it with n = row_capacity).  Output
    is bitwise identical (the in-kernel exact test still prunes span
    boundary slop); only slot-space occupancy changes.

    Returns (sort_ops, (num_keys, is_stable, drop), plan_tuple, total,
    overflow): pass ``sort_ops`` through ``jax.lax.sort(num_keys=...,
    is_stable=...)`` — in the production renderers as its OWN dispatched
    program (see :func:`fused_binning_words`) — then skip ``drop`` payload
    leaders and derive tiles with :func:`binning_sorted_tile`.
    """
    import jax
    from ..kernels import expand as E
    from ..ops import binning as B

    plan_tuple = None
    if key_plan is not None and not fused_depth16:
        if packed is None:
            depth_sort_word = key_plan.normalize(depth_sort_word)
        plan_tuple = key_plan.kernel_tuple

    if packed is not None:
        # Pallas-projected inputs (kernels/project.project_and_cull_packed):
        # rect word / rect_h / normalized depth word / record words arrive
        # prep-ready straight from the fused projection kernel.
        mode = ("mono" if exact_test is True
                else "warped" if warped_bounds is not None else "stereo")
        use_rows = row_capacity > 0 and mode == "mono" and plan_tuple is not None
        tab = E.binning_prep_pallas(
            packed.rect_word, packed.rect_h, packed.dsw,
            packed.words, tile_w=tile_w, tile_h=tile_h,
            alpha_threshold=alpha_threshold, interpret=interpret, mode=mode,
            warped_bounds=warped_bounds, lod_min=lod_min,
            count_rows=use_rows)
        n_tab = packed.visible.shape[0]
        row_overflow = None
        if use_rows:
            tab, row_overflow = E.row_expand_pallas(
                tab, n=n_tab, row_capacity=row_capacity, tile_w=tile_w,
                tile_h=tile_h, alpha_threshold=alpha_threshold,
                interpret=interpret)
            n_tab = row_capacity
        outs = E.expand_slots_pallas(
            None, None, None, capacity=capacity, tiles_x=tiles_x,
            fused_depth16=fused_depth16, exact_test=exact_test,
            tile_w=tile_w, tile_h=tile_h, alpha_threshold=alpha_threshold,
            prebuilt_tab=tab, n_gaussians=n_tab,
            warped_bounds=warped_bounds, interpret=interpret,
            key_plan=plan_tuple)
        key, d_slot = outs[0], outs[1]
        slot_words = outs[2:-2]
        total, overflow = outs[-2], outs[-1]
        if row_overflow is not None:
            overflow = jnp.maximum(overflow, row_overflow)
        if fused_depth16:
            sort_ops = (key, *slot_words)
            num_keys, is_stable, drop = 1, True, 0
        else:
            sort_ops = (key, d_slot, *slot_words)
            num_keys, is_stable, drop = 2, (plan_tuple is None), 1
        return (sort_ops, (num_keys, is_stable, drop), plan_tuple, total,
                overflow)

    if use_prep is None:
        use_prep = (use_pallas and precount
                    and ((exact_test is True and len(word_list) == 4)
                         or (exact_test == "stereo" and len(word_list) == 8))
                    and tile_row_offset is None and mask_override is None)
    if use_prep:
        # fused Pallas prep: masks + pre-counts + global offset scan + the
        # combined plane-major table in ONE elementwise pass (replaces the
        # XLA exact/stereo_tile_masks / cumsum / pad+stack chain; with
        # warped_bounds it also fuses the foveated boundary gathers)
        rect_w = max_tx - min_tx + 1
        rect_word0 = B.pack_rect_word(min_tx, min_ty, rect_w)
        rect_word0 = jnp.where(visible, rect_word0,
                               rect_word0 | jnp.uint32(E.CULLED_BIT))
        rect_h = rect_count // jnp.maximum(rect_w, 1)
        mode = ("mono" if exact_test is True
                else "warped" if warped_bounds is not None else "stereo")
        use_rows = (row_capacity > 0 and mode == "mono"
                    and plan_tuple is not None)
        tab = E.binning_prep_pallas(
            rect_word0, rect_h, depth_sort_word.astype(jnp.uint32),
            [w.astype(jnp.uint32) for w in word_list],
            tile_w=tile_w, tile_h=tile_h, alpha_threshold=alpha_threshold,
            interpret=interpret, mode=mode, warped_bounds=warped_bounds,
            lod_min=lod_min, count_rows=use_rows)
        n_tab = visible.shape[0]
        if use_rows:
            tab, row_overflow = E.row_expand_pallas(
                tab, n=n_tab, row_capacity=row_capacity, tile_w=tile_w,
                tile_h=tile_h, alpha_threshold=alpha_threshold,
                interpret=interpret)
            n_tab = row_capacity
        outs = E.expand_slots_pallas(
            None, None, None, capacity=capacity, tiles_x=tiles_x,
            fused_depth16=fused_depth16, exact_test=exact_test,
            tile_w=tile_w, tile_h=tile_h, alpha_threshold=alpha_threshold,
            prebuilt_tab=tab, n_gaussians=n_tab,
            warped_bounds=warped_bounds, interpret=interpret,
            key_plan=plan_tuple)
        if use_rows:
            outs = outs[:-1] + (jnp.maximum(outs[-1], row_overflow),)
    else:
        counts, rect_word, tile_mask, aux = binning_inputs(
            visible, min_tx, min_ty, max_tx, rect_count, depth_sort_word,
            word_list, exact_test=exact_test, tile_w=tile_w, tile_h=tile_h,
            alpha_threshold=alpha_threshold,
            # foveated targets test against warped physical-tile rects
            # in-kernel; the display-space mask predicate would disagree,
            # so no pre-count
            precount=precount and warped_bounds is None,
            tile_row_offset=tile_row_offset, mask_override=mask_override)

        expand = E.expand_slots_pallas if use_pallas else E.expand_slots_xla
        kw = {} if not use_pallas else {"interpret": interpret}
        outs = expand(counts, rect_word, aux, capacity=capacity,
                      tiles_x=tiles_x,
                      fused_depth16=fused_depth16, exact_test=exact_test,
                      tile_w=tile_w, tile_h=tile_h,
                      alpha_threshold=alpha_threshold,
                      tile_row_offset=tile_row_offset,
                      warped_bounds=warped_bounds, tile_mask=tile_mask,
                      key_plan=plan_tuple, **kw)
    key, d_slot = outs[0], outs[1]
    slot_words = outs[2:-2]
    total, overflow = outs[-2], outs[-1]

    if fused_depth16:
        sort_ops = (key, *slot_words)
        num_keys, is_stable, drop = 1, True, 0
    elif plan_tuple is not None:
        # tie-free fused keys: an UNSTABLE sort is deterministic and
        # reproduces the reference's stable depth-then-tile tie order exactly
        # (key2 low bits carry the gaussian input index — see KeyPlan)
        sort_ops = (key, d_slot, *slot_words)
        num_keys, is_stable, drop = 2, False, 1
    else:
        sort_ops = (key, d_slot, *slot_words)
        num_keys, is_stable, drop = 2, True, 1
    return sort_ops, (num_keys, is_stable, drop), plan_tuple, total, overflow


def binning_sorted_tile(sorted_key, *, fused_depth16: bool, plan_tuple):
    """Sorted tile ids from the sorted fused key (the post-sort half of
    :func:`fused_binning_words`)."""
    from ..kernels import expand as E

    if fused_depth16:
        return jnp.where(sorted_key == jnp.uint32(E.SENTINEL),
                         jnp.uint32(E.SENTINEL), sorted_key >> 16)
    if plan_tuple is not None:
        return jnp.where(sorted_key == jnp.uint32(E.SENTINEL),
                         jnp.uint32(E.SENTINEL),
                         sorted_key >> plan_tuple[0])
    return sorted_key


def fused_binning_words(*args, **kwargs):
    """Single-program fused binning (operands + sort + tile derivation).

    NOTE the production DepthFirst render path splits these three steps into
    SEPARATE dispatched programs: when the instance sort shares an XLA
    program with anything else, the memory-space-assignment pass pins other
    stages' buffers into alternate memory (VMEM) and the sort emitter's
    scratch collapses — the 3.0M 2-key unstable sort measures ~10.3 ms
    composed vs ~4.5 ms as its own program (scratch/sortreal.py,
    scratch/sortchain.py; killing MSA program-wide via
    xla_tpu_scoped_vmem_limit_kib=131072 makes the sort 3.9 ms but costs the
    REST of the frame ~16 ms, scratch/vmemflag.py — so the split, not the
    flag).  Returns (sorted_tile (C,), sorted word tuple, total, overflow).
    """
    sort_ops, (num_keys, is_stable, drop), plan_tuple, total, overflow = \
        binning_sort_operands(*args, **kwargs)
    ops = jax.lax.sort(sort_ops, num_keys=num_keys, is_stable=is_stable)
    sorted_key, sw = ops[0], ops[1 + drop:]
    sorted_tile = binning_sorted_tile(
        sorted_key, fused_depth16=kwargs.get("fused_depth16", False),
        plan_tuple=plan_tuple)
    return sorted_tile, sw, total, overflow


def fused_binning(pr, depth_sort_word, *, capacity: int, tiles_x: int,
                  fused_depth16: bool, use_pallas: bool,
                  interpret: bool = False, exact_test: bool = False,
                  tile_w: int = 16, tile_h: int = 16,
                  alpha_threshold: float = 0.005, key_plan=None,
                  row_capacity: int = 0):
    """Mono fused binning: one radix sort carrying the 4-word quantized record.

    ``fused_depth16``: True -> single fused key [tile:16 | depth_word:16]
    (Global/Local); False -> two sort keys ordering ties by input index,
    matching the reference's stable depth-then-tile sort output (DepthFirst):
    via the tie-free ``key_plan`` keys + an unstable sort when given, else a
    stable sort.

    Returns (sorted_tile (C,), sorted_words (C, 4), total_live, overflow, sw,
    slot_total).
    """
    words = pack_record_words(pr.record)
    word_list = [words[:, k] for k in range(4)]
    sorted_tile, sw, slot_total, overflow = fused_binning_words(
        pr.visible, pr.min_tx, pr.min_ty, pr.max_tx, pr.rect_count,
        depth_sort_word, word_list, capacity=capacity, tiles_x=tiles_x,
        fused_depth16=fused_depth16, use_pallas=use_pallas,
        interpret=interpret, exact_test=exact_test, tile_w=tile_w,
        tile_h=tile_h, alpha_threshold=alpha_threshold, key_plan=key_plan,
        row_capacity=row_capacity)
    sorted_words = jnp.stack(sw, axis=-1)  # (C, 4)
    total_live = jnp.sum(jnp.where(pr.visible, pr.rect_count, 0)).astype(jnp.int32)
    return sorted_tile, sorted_words, total_live, overflow, sw, slot_total


# ---------------------------------------------------------------------------
# Shared 3-program frame split for the fused-depth16 pipelines (Global /
# Local).  Rationale: the composed-sort pathology (see fused_binning_words) —
# the single-key instance sort must own its dispatched program to keep the
# emitter's VMEM scratch.  DepthFirst has its own pre/post (extra key-plan
# machinery); Global and Local share this one.
# ---------------------------------------------------------------------------

def d16_packed_sorted(gi, view, proj, center, comp=None, harm=None, *,
                      width, height, capacity, tiles_x, sh_degree,
                      alpha_threshold, total_ink_threshold, near_plane,
                      far_plane, input_is_srgb, tile_w, tile_h,
                      interpret=False):
    """Fused Pallas projection (depth16 key) + prep/expand + single-key sort
    for the Global/Local fused frames.  Returns (sorted_tile, sw,
    slot_total, overflow, visible)."""
    from ..kernels.project import project_and_cull_packed

    packed = project_and_cull_packed(
        gi, view, proj, center,
        width=width, height=height, tile_w=tile_w, tile_h=tile_h,
        sh_degree=sh_degree, near_plane=near_plane, far_plane=far_plane,
        alpha_threshold=alpha_threshold,
        total_ink_threshold=total_ink_threshold,
        input_is_srgb=input_is_srgb, key_plan=None, depth_key16=True,
        interpret=interpret,
        prepared=None if comp is None else (comp, harm))
    sort_ops, _spec, _plan, slot_total, overflow = binning_sort_operands(
        None, None, None, None, None, None, None,
        capacity=capacity, tiles_x=tiles_x, fused_depth16=True,
        use_pallas=True, interpret=interpret, exact_test=True,
        tile_w=tile_w, tile_h=tile_h, alpha_threshold=alpha_threshold,
        packed=packed)
    ops = jax.lax.sort(sort_ops, num_keys=1, is_stable=True)
    sorted_key, sw = ops[0], ops[1:]
    sorted_tile = binning_sorted_tile(sorted_key, fused_depth16=True,
                                      plan_tuple=None)
    return sorted_tile, sw, slot_total, overflow, packed.visible


def d16_pre_frame(gi, view, proj, center, comp=None, harm=None, *,
                  width: int, height: int, capacity: int,
                  sh_degree: int, alpha_threshold: float,
                  total_ink_threshold: float,
                  near_plane: float, far_plane: float, input_is_srgb: bool,
                  tile_w: int, tile_h: int, interpret: bool = False,
                  pallas_project: bool = True):
    """Program 1: project + fused Pallas prep + expand, stopping at the
    single-key [tile:16|depth16:16] sort operands.  Returns
    (key, w0..w3, slot_total, overflow, visible_count)."""
    from ..config import tiles_for
    from ..ops.project import project_and_cull

    tiles_x, tiles_y = tiles_for(width, height, tile_w, tile_h)
    if tiles_x * tiles_y > 0xFFFF:
        raise ValueError("fused depth16 tile id must fit 16 bits "
                         f"({tiles_x * tiles_y} tiles)")
    if pallas_project:
        # fused Pallas projection emitting the half-depth key directly
        # (kernels/project.py, depth_key16 mode)
        from ..kernels.project import project_and_cull_packed
        packed = project_and_cull_packed(
            gi, view, proj, center,
            width=width, height=height, tile_w=tile_w, tile_h=tile_h,
            sh_degree=sh_degree, near_plane=near_plane,
            far_plane=far_plane, alpha_threshold=alpha_threshold,
            total_ink_threshold=total_ink_threshold,
            input_is_srgb=input_is_srgb, key_plan=None, depth_key16=True,
            interpret=interpret,
            prepared=None if comp is None else (comp, harm))
        sort_ops, _spec, _plan, slot_total, overflow = binning_sort_operands(
            None, None, None, None, None, None, None,
            capacity=capacity, tiles_x=tiles_x, fused_depth16=True,
            use_pallas=True, interpret=interpret, exact_test=True,
            tile_w=tile_w, tile_h=tile_h, alpha_threshold=alpha_threshold,
            packed=packed)
        visible_count = jnp.sum(packed.visible).astype(jnp.int32)
        return (*sort_ops, slot_total, overflow, visible_count)

    pr = project_and_cull(
        gi, view, proj, center,
        width=width, height=height, tile_w=tile_w, tile_h=tile_h,
        sh_degree=sh_degree, near_plane=near_plane, far_plane=far_plane,
        alpha_threshold=alpha_threshold,
        total_ink_threshold=total_ink_threshold,
        input_is_srgb=input_is_srgb,
    )
    depth16 = M.half_depth_key16(pr.record.depth.astype(jnp.float32))
    words = pack_record_words(pr.record)
    word_list = [words[:, k] for k in range(4)]
    sort_ops, _spec, _plan, slot_total, overflow = binning_sort_operands(
        pr.visible, pr.min_tx, pr.min_ty, pr.max_tx, pr.rect_count,
        depth16, word_list, capacity=capacity, tiles_x=tiles_x,
        fused_depth16=True, use_pallas=True, interpret=interpret,
        exact_test=True, tile_w=tile_w, tile_h=tile_h,
        alpha_threshold=alpha_threshold)
    visible_count = jnp.sum(pr.visible).astype(jnp.int32)
    return (*sort_ops, slot_total, overflow, visible_count)


def d16_post_frame(sorted_key, w0, w1, w2, w3,
                   slot_total, overflow, visible_count, *,
                   width: int, height: int, capacity: int,
                   tile_w: int, tile_h: int,
                   depth_mode: str = "weighted", max_per_tile: int = 0,
                   interpret: bool = False):
    """Program 3: sorted single keys -> ranges -> Pallas blend -> image."""
    from ..config import tiles_for
    from ..kernels import blend as K
    from ..ops import binning as B
    from ..types import FrameHeader, RenderOutput

    tiles_x, tiles_y = tiles_for(width, height, tile_w, tile_h)
    sorted_tile = binning_sorted_tile(sorted_key, fused_depth16=True,
                                      plan_tuple=None)
    starts, counts = B.extract_tile_ranges(sorted_tile, tiles_x * tiles_y)
    if max_per_tile > 0:
        # Local parity: silent per-tile drop past the fixed capacity
        counts = jnp.minimum(counts, max_per_tile)
    wtable = K.build_words_table((w0, w1, w2, w3), capacity)
    tc, td = K.blend_tiles_pallas(wtable, starts, counts, tiles_x=tiles_x,
                                  tiles_y=tiles_y, tile_w=tile_w,
                                  tile_h=tile_h, depth_mode=depth_mode,
                                  interpret=interpret)
    color, depth = K.assemble_image(tc, td, tiles_x=tiles_x, tiles_y=tiles_y,
                                    width=width, height=height,
                                    tile_w=tile_w, tile_h=tile_h)
    header = FrameHeader(
        visible_count=visible_count,
        total_instances=jnp.sum(counts).astype(jnp.int32),
        overflow=overflow,
        slot_total=slot_total,
    )
    return RenderOutput(color=color, depth=depth, header=header)


def d16_sort_frame(*ops, num_keys: int = 1, is_stable: bool = True):
    """Program 2: the bare single-key sort (nothing else may share it)."""
    return jax.lax.sort(ops, num_keys=num_keys, is_stable=is_stable)


def render_split16(renderer, tag, gi, view, proj, center, statics, n, *,
                   depth_mode: str = "weighted", max_per_tile: int = 0):
    """Three-program dispatch for Global/Local (see d16_pre_frame)."""
    from .base import AotProgram
    from ..kernels.project import cached_projection_inputs

    pre_keys = ("width", "height", "capacity", "sh_degree",
                "alpha_threshold", "total_ink_threshold", "near_plane",
                "far_plane", "input_is_srgb", "tile_w", "tile_h")
    pre_statics = {k: statics[k] for k in pre_keys}
    post_statics = dict(width=statics["width"], height=statics["height"],
                        capacity=statics["capacity"],
                        tile_w=statics["tile_w"], tile_h=statics["tile_h"],
                        depth_mode=depth_mode, max_per_tile=max_per_tile)
    prep_args = cached_projection_inputs(gi, statics["sh_degree"])

    sig = (tag, n, gi.sh_n_coeffs, str(gi.scales.dtype), len(prep_args),
           tuple(sorted(pre_statics.items())))
    pre = renderer._program((tag + "_pre", sig), lambda: AotProgram(
        d16_pre_frame, (tag + "_pre", sig), pre_statics))
    outs = pre(gi, view, proj, center, *prep_args)
    sort_ops = outs[:-3]
    slot_total, overflow, visible_count = outs[-3:]

    sort_sig = (tag + "_sort", statics["capacity"], len(sort_ops))
    sortp = renderer._program(sort_sig, lambda: AotProgram(
        d16_sort_frame, sort_sig, {}))
    sorted_ops = sortp(*sort_ops)

    post_sig = (tag + "_post", tuple(sorted(post_statics.items())))
    post = renderer._program(post_sig, lambda: AotProgram(
        d16_post_frame, post_sig, post_statics))
    return post(sorted_ops[0], *sorted_ops[1:], slot_total, overflow,
                visible_count)
