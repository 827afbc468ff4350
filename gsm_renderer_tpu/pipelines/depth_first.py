"""DepthFirstRenderer — the flagship pipeline.

Reference call stack (DepthFirstRenderer.swift:237-465): projectCull -> visibility
compaction -> depth radix sort -> apply-depth-order -> instance-offset prefix sum
-> createInstances -> stable tile sort -> extract ranges -> tiled render.

TPU-native flow (one jitted program, no host syncs):

  1. fused project+cull (XLA vector math)                 [ops/project.py]
  2. stable depth sort of gaussians (lax.sort)            [ops/binning.depth_order]
  3. counts/offsets in depth order; scatter-free inverse
     slot map (rank, j per instance slot)                 [ops/binning.build_slot_map]
  4. closed-form per-slot tile ids                        [ops/binning.slot_tile_ids]
  5. ONE stable sort by tile id — stability preserves
     depth order within tiles (the reference's stable
     tile radix sort property)                            [ops/binning.stable_sort_by_tile]
  6. gather quantized records into sorted order; derive
     blend attrs + exact per-tile ellipse mask            [pipelines/common.py]
  7. per-tile ranges via vectorized binary search         [ops/binning.extract_tile_ranges]
  8. Pallas row-blend kernel -> image                     [kernels/blend.py]
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from .. import config as cfg
from ..camera import CameraParams
from ..kernels import blend as K
from ..ops import binning as B
from ..ops.project import project_and_cull
from ..types import FrameHeader, GaussianInput, RenderOutput
from ..kernels.expand import CULLED_BIT as E_CULLED_BIT
from ..kernels.expand import MASK_H as E_MASK_H
from ..kernels.expand import MASK_W as E_MASK_W
from .base import AotProgram, GaussianRenderer, instance_capacity
from .common import (binning_sort_operands, binning_sorted_tile,
                     fused_binning, pack_record_words,
                     sorted_instance_attrs)

Array = Any


def _row_demand(rect_word, rect_h):
    """Virtual-row demand of the per-row exact-span decomposition — the same
    formula as the prep kernel's ``count_rows`` mode (one row per
    mask-eligible or culled gaussian, ``rect_h`` per oversized rect); feeds
    ``FrameHeader.row_total`` for adaptive row-capacity sizing."""
    visible = (rect_word & jnp.uint32(E_CULLED_BIT)) == 0
    rect_w = ((rect_word >> 20) & jnp.uint32(0x3FF)).astype(jnp.int32)
    oversized = visible & ((rect_w > E_MASK_W) | (rect_h > E_MASK_H))
    return jnp.sum(jnp.where(oversized, rect_h, 1)).astype(jnp.int32)


def depth_first_frame(
    gi: GaussianInput,
    view: Array, proj: Array, center: Array,
    comp: Array | None = None, harm: Array | None = None,
    *,
    width: int, height: int, capacity: int,
    sh_degree: int, alpha_threshold: float, total_ink_threshold: float,
    near_plane: float, far_plane: float, input_is_srgb: bool,
    tile_w: int = 16, tile_h: int = 16,
    exact_tile_test: bool = True,
    back_to_front: bool = False,
    depth_key_bits: int = 32,
    tile_id_bits: int = 16,
    max_per_tile: int = 0,
    depth_mode: str = "weighted",
    blocks_per_dma: int = 2,
    r2_cutoff: float = 0.0,
    use_xla_blend: bool = False,
    interpret: bool = False,
    pallas_project: bool = True,
    row_capacity: int = 0,
):
    """The complete DepthFirst frame program (jit-compatible; all kwargs static).

    ``exact_tile_test=False`` + ``depth_mode="normalized"`` + ``r2_cutoff=9``
    is the HardwareRenderer configuration (quads cover their OBB rect with a
    per-pixel r^2 cutoff and alpha-normalized depth — see pipelines/hardware.py).

    ``row_capacity > 0`` enables the per-row exact-span decomposition of
    oversized rects (kernels/expand.row_expand_pallas): near-exact instance
    counts for the heavy tail, bitwise-identical output, much smaller slot
    space on realistic scenes.  Requires the mono Pallas path with 32-bit
    depth keys; silently off otherwise.
    """
    tiles_x, tiles_y = cfg.tiles_for(width, height, tile_w, tile_h)
    num_tiles = tiles_x * tiles_y
    # tileIdPrecision (DepthFirstRenderer.swift:45-50): 16-bit instance tile
    # ids require the tile grid to fit u16 (it does at <= 4K-wide surfaces).
    if tile_id_bits == 16 and num_tiles > 0xFFFF:
        raise ValueError(
            f"tile_id_precision BITS16 cannot address {num_tiles} tiles; use "
            "TileIdPrecision.BITS32")

    # With 16-bit tile ids AND 16-bit depth keys both orderings fit one fused
    # 32-bit key [tile:16 | depth16:16] — a single-key sort, exactly the
    # reference's combined (tileIdPrecision=bits16, depthSortKeyPrecision=
    # bits16) configuration.  Tie order (equal quantized depths within a tile)
    # is input order in both systems: the reference's stable depth sort
    # preserves input order of ties and its stable tile sort preserves that.
    fuse_key = (tile_id_bits == 16 and depth_key_bits == 16)

    # Tie-free fused keys -> unstable instance sort with exact reference tie
    # order (ops/binning.KeyPlan; None falls back to the stable sort).  With
    # the row decomposition the plan's index bits address VIRTUAL ROWS (row
    # order == gaussian order for ties: rows are emitted in gaussian order
    # and two rows of one gaussian never share a tile).
    key_plan = None
    use_rows = False
    if not fuse_key:
        if depth_key_bits == 16:
            key_plan = B.make_key_plan(num_tiles, gi.count,
                                       depth_span_bits=16)
        else:
            if (row_capacity > 0 and not use_xla_blend
                    and exact_tile_test is True and max_per_tile <= 0):
                kp = B.make_key_plan(num_tiles, row_capacity,
                                     near_plane=near_plane,
                                     far_plane=far_plane)
                if kp is not None:
                    key_plan, use_rows = kp, True
            if key_plan is None:
                key_plan = B.make_key_plan(num_tiles, gi.count,
                                           near_plane=near_plane,
                                           far_plane=far_plane)
    if not use_rows:
        row_capacity = 0

    # back_to_front maps to the same front-to-back transmittance program (the
    # two blend orders produce identical radiance; see pipelines/hardware.py).
    del back_to_front

    # Fused Pallas projection (kernels/project.py): project + cull +
    # quantize + pack in one HBM pass — the XLA chain costs ~3.5 ms at the
    # headline vs ~1 ms fused (scratch/projab.py, visible-row bitexact).
    use_pallas_project = (pallas_project
                          and not use_xla_blend and exact_tile_test is True
                          and depth_key_bits == 32 and key_plan is not None
                          and max_per_tile <= 0)
    if use_pallas_project:
        from ..kernels.project import project_and_cull_packed
        with jax.named_scope("project_cull"):
            packed = project_and_cull_packed(
                gi, view, proj, center,
                width=width, height=height, tile_w=tile_w, tile_h=tile_h,
                sh_degree=sh_degree, near_plane=near_plane,
                far_plane=far_plane, alpha_threshold=alpha_threshold,
                total_ink_threshold=total_ink_threshold,
                input_is_srgb=input_is_srgb, key_plan=key_plan,
                interpret=interpret,
                prepared=None if comp is None else (comp, harm))
        with jax.named_scope("fused_binning"):
            sort_ops, (num_keys, is_stable, drop), plan_tuple, slot_total, \
                overflow = binning_sort_operands(
                    None, None, None, None, None, None, None,
                    capacity=capacity, tiles_x=tiles_x, fused_depth16=False,
                    use_pallas=True, interpret=interpret, exact_test=True,
                    tile_w=tile_w, tile_h=tile_h,
                    alpha_threshold=alpha_threshold, key_plan=key_plan,
                    packed=packed, row_capacity=row_capacity)
            ops = jax.lax.sort(sort_ops, num_keys=num_keys,
                               is_stable=is_stable)
            sorted_key, sw = ops[0], ops[1 + drop:]
            sorted_tile = binning_sorted_tile(sorted_key, fused_depth16=False,
                                              plan_tuple=plan_tuple)
        visible = packed.visible
        total_live = None
        # measured every frame (row path on or off) so pick_row_capacity can
        # re-enable the decomposition when the tail lightens
        row_total = _row_demand(packed.rect_word, packed.rect_h)
    else:
        with jax.named_scope("project_cull"):
            pr = project_and_cull(
                gi, view, proj, center,
                width=width, height=height, tile_w=tile_w, tile_h=tile_h,
                sh_degree=sh_degree, near_plane=near_plane,
                far_plane=far_plane,
                alpha_threshold=alpha_threshold,
                total_ink_threshold=total_ink_threshold,
                input_is_srgb=input_is_srgb,
            )

        depth_key = pr.depth_key
        if depth_key_bits == 16:
            # 16-bit key re-quantization (DF_DEPTH_KEY_16 function constant,
            # VisibilityCompactionEncoder.swift:29-34): half bits ^ 0x8000.
            from .. import mathlib as M
            dk16 = M.half_depth_key16(M.sortable_uint_to_float(depth_key))
            depth_key = jnp.where(pr.visible, dk16, jnp.uint32(0xFFFFFFFF))

        with jax.named_scope("fused_binning"):
            sorted_tile, sorted_words, total_live, overflow, sw, slot_total = \
                fused_binning(
                    pr, depth_key, capacity=capacity, tiles_x=tiles_x,
                    fused_depth16=fuse_key,
                    use_pallas=not use_xla_blend, interpret=interpret,
                    exact_test=exact_tile_test, tile_w=tile_w, tile_h=tile_h,
                    alpha_threshold=alpha_threshold, key_plan=key_plan,
                    row_capacity=row_capacity)
        visible = pr.visible
        if exact_tile_test is True:
            rect_w = pr.max_tx - pr.min_tx + 1
            rect_h = pr.rect_count // jnp.maximum(rect_w, 1)
            row_total = jnp.sum(jnp.where(
                pr.visible & ((rect_w > E_MASK_W) | (rect_h > E_MASK_H)),
                rect_h, 1)).astype(jnp.int32)
        else:
            row_total = None

    with jax.named_scope("tile_ranges"):
        starts, counts = B.extract_tile_ranges(sorted_tile, num_tiles)
    if max_per_tile > 0:
        # Local-renderer parity: silent per-tile drop past the fixed capacity
        # (LocalShaders.metal:660-664).
        counts = jnp.minimum(counts, max_per_tile)

    with jax.named_scope("blend"):
        if use_xla_blend:
            # the exact per-tile test already ran at expansion (reference
            # semantics); derive blend attrs only for the XLA oracle path
            # (the Pallas kernel decodes the sorted record words in-VMEM)
            attrs = sorted_instance_attrs(
                sorted_words, sorted_tile, tiles_x=tiles_x, tile_w=tile_w,
                tile_h=tile_h, alpha_threshold=alpha_threshold,
                exact_tile_test=False)
            table = K.build_blend_table(attrs, capacity)
            mpt = max_per_tile if max_per_tile > 0 else min(capacity, 4096)
            tc, td = K.blend_tiles_xla(table, starts, counts, tiles_x=tiles_x,
                                       tiles_y=tiles_y, max_per_tile=mpt,
                                       tile_w=tile_w, tile_h=tile_h,
                                       depth_mode=depth_mode,
                                       r2_cutoff=r2_cutoff)
        else:
            wtable = K.build_words_table(sw, capacity)
            tc, td = K.blend_tiles_pallas(wtable, starts, counts,
                                          tiles_x=tiles_x,
                                          tiles_y=tiles_y, tile_w=tile_w,
                                          tile_h=tile_h,
                                          depth_mode=depth_mode,
                                          blocks_per_dma=blocks_per_dma,
                                          r2_cutoff=r2_cutoff,
                                          interpret=interpret)
    with jax.named_scope("assemble"):
        color, depth = K.assemble_image(tc, td, tiles_x=tiles_x,
                                        tiles_y=tiles_y,
                                        width=width, height=height,
                                        tile_w=tile_w, tile_h=tile_h)

    header = FrameHeader(
        visible_count=jnp.sum(visible).astype(jnp.int32),
        # post-exact-test instance count (reference totalInstances semantics)
        total_instances=jnp.sum(counts).astype(jnp.int32)
        if max_per_tile <= 0 else total_live,
        overflow=overflow,
        slot_total=slot_total,
        row_total=row_total,
    )
    return RenderOutput(color=color, depth=depth, header=header)


def _mono_key_statics(n_gaussians: int, *, width, height, tile_w, tile_h,
                      depth_key_bits, tile_id_bits, near_plane, far_plane,
                      row_capacity: int = 0):
    """(fuse_key, key_plan) for the mono frame — shared by the fused and the
    split (three-program) paths so both derive identical sort semantics.

    ``row_capacity > 0``: the plan's index bits address virtual rows (the
    per-row exact-span decomposition); returns key_plan=None if the widened
    index field no longer fits — callers must then run with
    ``row_capacity=0``."""
    tiles_x, tiles_y = cfg.tiles_for(width, height, tile_w, tile_h)
    num_tiles = tiles_x * tiles_y
    fuse_key = (tile_id_bits == 16 and depth_key_bits == 16)
    key_plan = None
    if not fuse_key:
        key_n = row_capacity if row_capacity > 0 else n_gaussians
        if depth_key_bits == 16:
            key_plan = B.make_key_plan(num_tiles, key_n,
                                       depth_span_bits=16)
        else:
            key_plan = B.make_key_plan(num_tiles, key_n,
                                       near_plane=near_plane,
                                       far_plane=far_plane)
    return fuse_key, key_plan


def depth_first_pre_frame(
    gi: GaussianInput,
    view: Array, proj: Array, center: Array,
    comp: Array | None = None, harm: Array | None = None,
    *,
    width: int, height: int, capacity: int,
    sh_degree: int, alpha_threshold: float, total_ink_threshold: float,
    near_plane: float, far_plane: float, input_is_srgb: bool,
    tile_w: int = 16, tile_h: int = 16,
    exact_tile_test: bool = True,
    back_to_front: bool = False,
    depth_key_bits: int = 32,
    tile_id_bits: int = 16,
    interpret: bool = False,
    row_capacity: int = 0,
):
    """Program 1 of the production 3-program frame: project + fused Pallas
    binning prep + expand, STOPPING at the instance-sort operands.

    The split exists because XLA's memory-space-assignment, given any
    co-resident stages, pins their buffers into alternate memory (VMEM) and
    the sort emitter's scratch collapses: the 3.0M 2-key unstable sort is
    ~10.3 ms composed vs ~4.5 ms as its own program (BACKLOG receipts;
    scratch/sortreal.py, sortchain.py, vmemflag.py).  Returns
    (*sort_ops, slot_total, overflow, visible_count, row_total) —
    row_total is -1 when the row decomposition is off.
    """
    tiles_x, tiles_y = cfg.tiles_for(width, height, tile_w, tile_h)
    del back_to_front
    use_rows = (row_capacity > 0 and exact_tile_test is True
                and depth_key_bits == 32)
    fuse_key, key_plan = _mono_key_statics(
        gi.count, width=width, height=height, tile_w=tile_w,
        tile_h=tile_h, depth_key_bits=depth_key_bits,
        tile_id_bits=tile_id_bits, near_plane=near_plane,
        far_plane=far_plane, row_capacity=row_capacity if use_rows else 0)
    if use_rows and key_plan is None:
        use_rows = False
        fuse_key, key_plan = _mono_key_statics(
            gi.count, width=width, height=height, tile_w=tile_w,
            tile_h=tile_h, depth_key_bits=depth_key_bits,
            tile_id_bits=tile_id_bits, near_plane=near_plane,
            far_plane=far_plane)
    if not use_rows:
        row_capacity = 0

    # fused Pallas projection (see depth_first_frame)
    if (exact_tile_test is True and depth_key_bits == 32
            and key_plan is not None):
        from ..kernels.project import project_and_cull_packed
        with jax.named_scope("project_cull"):
            packed = project_and_cull_packed(
                gi, view, proj, center,
                width=width, height=height, tile_w=tile_w, tile_h=tile_h,
                sh_degree=sh_degree, near_plane=near_plane,
                far_plane=far_plane, alpha_threshold=alpha_threshold,
                total_ink_threshold=total_ink_threshold,
                input_is_srgb=input_is_srgb, key_plan=key_plan,
                interpret=interpret,
                prepared=None if comp is None else (comp, harm))
        with jax.named_scope("binning_prep"):
            sort_ops, _spec, _plan, slot_total, overflow = \
                binning_sort_operands(
                    None, None, None, None, None, None, None,
                    capacity=capacity, tiles_x=tiles_x, fused_depth16=False,
                    use_pallas=True, interpret=interpret, exact_test=True,
                    tile_w=tile_w, tile_h=tile_h,
                    alpha_threshold=alpha_threshold, key_plan=key_plan,
                    packed=packed, row_capacity=row_capacity)
        visible_count = jnp.sum(packed.visible).astype(jnp.int32)
        row_total = _row_demand(packed.rect_word, packed.rect_h)
        return (*sort_ops, slot_total, overflow, visible_count, row_total)

    with jax.named_scope("project_cull"):
        pr = project_and_cull(
            gi, view, proj, center,
            width=width, height=height, tile_w=tile_w, tile_h=tile_h,
            sh_degree=sh_degree, near_plane=near_plane, far_plane=far_plane,
            alpha_threshold=alpha_threshold,
            total_ink_threshold=total_ink_threshold,
            input_is_srgb=input_is_srgb,
        )
    depth_key = pr.depth_key
    if depth_key_bits == 16:
        from .. import mathlib as M
        dk16 = M.half_depth_key16(M.sortable_uint_to_float(depth_key))
        depth_key = jnp.where(pr.visible, dk16, jnp.uint32(0xFFFFFFFF))

    words = pack_record_words(pr.record)
    word_list = [words[:, k] for k in range(4)]
    with jax.named_scope("binning_prep"):
        sort_ops, _spec, _plan, slot_total, overflow = binning_sort_operands(
            pr.visible, pr.min_tx, pr.min_ty, pr.max_tx, pr.rect_count,
            depth_key, word_list, capacity=capacity, tiles_x=tiles_x,
            fused_depth16=fuse_key, use_pallas=True, interpret=interpret,
            exact_test=exact_tile_test, tile_w=tile_w, tile_h=tile_h,
            alpha_threshold=alpha_threshold, key_plan=key_plan)
    visible_count = jnp.sum(pr.visible).astype(jnp.int32)
    return (*sort_ops, slot_total, overflow, visible_count,
            jnp.full((), -1, jnp.int32))


def sort_frame(*ops, num_keys: int, is_stable: bool):
    """Program 2: the bare instance sort — nothing else may share this
    program (see depth_first_pre_frame's docstring)."""
    return jax.lax.sort(ops, num_keys=num_keys, is_stable=is_stable)


def depth_first_post_frame(
    sorted_key: Array, w0: Array, w1: Array, w2: Array, w3: Array,
    slot_total: Array, overflow: Array, visible_count: Array,
    row_total: Array,
    *,
    width: int, height: int, capacity: int, n_gaussians: int,
    alpha_threshold: float,
    near_plane: float, far_plane: float,
    tile_w: int = 16, tile_h: int = 16,
    depth_key_bits: int = 32,
    tile_id_bits: int = 16,
    depth_mode: str = "weighted",
    blocks_per_dma: int = 2,
    r2_cutoff: float = 0.0,
    interpret: bool = False,
    row_capacity: int = 0,
):
    """Program 3 of the production frame: sorted keys -> tile ranges ->
    blend table -> Pallas blend -> image + header.

    ``n_gaussians`` (and ``row_capacity``, when the row decomposition is on)
    must match program 1's statics: the KeyPlan (and with it the key1 shift
    and the plan-vs-fallback choice) depends on them.
    """
    tiles_x, tiles_y = cfg.tiles_for(width, height, tile_w, tile_h)
    num_tiles = tiles_x * tiles_y
    fuse_key, key_plan = _mono_key_statics(
        n_gaussians, width=width, height=height, tile_w=tile_w,
        tile_h=tile_h,
        depth_key_bits=depth_key_bits, tile_id_bits=tile_id_bits,
        near_plane=near_plane, far_plane=far_plane,
        row_capacity=row_capacity)
    plan_tuple = None
    if key_plan is not None:
        plan_tuple = key_plan.kernel_tuple
    sorted_tile = binning_sorted_tile(sorted_key, fused_depth16=fuse_key,
                                      plan_tuple=plan_tuple)
    with jax.named_scope("tile_ranges"):
        starts, counts = B.extract_tile_ranges(sorted_tile, num_tiles)
    sw = (w0, w1, w2, w3)
    with jax.named_scope("blend"):
        wtable = K.build_words_table(sw, capacity)
        tc, td = K.blend_tiles_pallas(wtable, starts, counts,
                                      tiles_x=tiles_x, tiles_y=tiles_y,
                                      tile_w=tile_w, tile_h=tile_h,
                                      depth_mode=depth_mode,
                                      blocks_per_dma=blocks_per_dma,
                                      r2_cutoff=r2_cutoff,
                                      interpret=interpret)
    with jax.named_scope("assemble"):
        color, depth = K.assemble_image(tc, td, tiles_x=tiles_x,
                                        tiles_y=tiles_y,
                                        width=width, height=height,
                                        tile_w=tile_w, tile_h=tile_h)
    header = FrameHeader(
        visible_count=visible_count,
        total_instances=jnp.sum(counts).astype(jnp.int32),
        overflow=overflow,
        slot_total=slot_total,
        row_total=row_total,
    )
    return RenderOutput(color=color, depth=depth, header=header)


class DepthFirstRenderer(GaussianRenderer):
    """Flagship renderer: global depth sort + stable tile sort.

    API parity with the reference DepthFirstRenderer (DepthFirstRenderer.swift),
    including ``depth_sort_key_precision`` via RendererConfig.
    """

    _stereo_key = "df_stereo"

    #: production mono frames can run as THREE dispatched programs (pre |
    #: bare sort | post) so the instance sort gets a program of its own —
    #: see _render_split.  Device-side this wins ~6 ms at the headline
    #: (composed-sort pathology receipts in BACKLOG.md), but each dependent
    #: dispatch through the tunneled axon backend costs a ~3 ms host round
    #: trip, so the 3-dispatch frame measures 25.4-26.5 vs 21.6-24.7 wall
    #: (scratch/splitab.py, bitwise-identical output).  Default: split on a
    #: real local TPU backend, fused single program through the tunnel.
    split_frame = None  # None = auto by backend

    def _stereo_statics(self):
        """Per-renderer stereo frame statics (HardwareRenderer overrides with
        its normalized-depth resolve + backend submission granularity)."""
        return {}

    def render_stereo(self, gi, camera, width, height):
        """Side-by-side stereo (DepthFirstRenderer.renderStereo(.sideBySide),
        DepthFirstRenderer.swift:205-235)."""
        return _stereo_render(self, gi, camera, width, height)

    def render_stereo_foveated(self, gi, camera, target):
        """Foveated stereo (the reference's rasterization-rate-map path,
        DepthFirstRenderer.renderStereo(.foveated) —
        DepthFirstRenderer.swift:516-551).

        Rasterizes DIRECTLY into the reduced-rate physical target via
        :func:`depth_first_stereo_foveated_frame` — the frame costs LESS than
        a full-resolution stereo frame (the rate map's purpose).  ``target``:
        a stereo.FoveatedStereoTarget; returns a render_height x
        2*render_width physical image (expand with stereo.expand_foveated
        for display)."""
        return _stereo_foveated_render(self, gi, camera, target)

    def render_stereo_foveated_compress(self, gi, camera, target):
        """Legacy render-full-then-compress foveated path (the pre-rate-map
        structure); kept for comparison tests."""
        from ..stereo import compress_foveated

        out = self.render_stereo(gi, camera, target.display_width,
                                 target.display_height)
        color = compress_foveated(out.color, target, stereo=True)
        depth = compress_foveated(out.depth[..., None], target,
                                  stereo=True)[..., 0]
        return RenderOutput(color=color, depth=depth, header=out.header)

    #: mono program-cache tag + capacity factor (HardwareRenderer overrides:
    #: full-rect expansion, no exact test — its quads cover their OBB rect)
    _mono_key = "df"
    _mono_capacity_factor: int | None = None

    def _mono_statics(self):
        """Per-renderer mono frame statics (HardwareRenderer overrides with
        exact_tile_test=False + normalized depth + r^2 cutoff + its
        submission granularity)."""
        return {}

    def render(self, gi: GaussianInput, camera: CameraParams,
               width: int, height: int) -> RenderOutput:
        return _mono_render(self, gi, camera, width, height)

    def _render_split(self, gi, view, proj, center, statics, n,
                      prep_args=()):
        """Production 3-program frame: pre (project+prep+expand) | bare sort |
        post (ranges+blend+assemble).  The instance sort must NOT share an
        XLA program with other stages — memory-space-assignment pins
        co-resident buffers into VMEM and the sort emitter's scratch
        collapses (~10.3 ms composed vs ~4.5 standalone at the 3.0M
        headline; see depth_first_pre_frame and BACKLOG receipts)."""
        pre_statics = {k: v for k, v in statics.items()
                       if k not in ("use_xla_blend", "depth_mode",
                                    "blocks_per_dma", "r2_cutoff",
                                    "max_per_tile")}
        post_keys = ("width", "height", "capacity", "alpha_threshold",
                     "near_plane", "far_plane", "tile_w", "tile_h",
                     "depth_key_bits", "tile_id_bits")
        post_statics = {k: statics[k] for k in post_keys}
        for k in ("depth_mode", "blocks_per_dma", "r2_cutoff",
                  "row_capacity"):
            if k in statics:
                post_statics[k] = statics[k]
        post_statics["n_gaussians"] = n

        fuse_key, key_plan = _mono_key_statics(
            n, width=statics["width"], height=statics["height"],
            tile_w=statics["tile_w"], tile_h=statics["tile_h"],
            depth_key_bits=statics["depth_key_bits"],
            tile_id_bits=statics["tile_id_bits"],
            near_plane=statics["near_plane"],
            far_plane=statics["far_plane"],
            row_capacity=statics.get("row_capacity", 0))
        if fuse_key:
            num_keys, is_stable, drop = 1, True, 0
        elif key_plan is not None:
            num_keys, is_stable, drop = 2, False, 1
        else:
            num_keys, is_stable, drop = 2, True, 1

        sig = (n, gi.sh_n_coeffs, str(gi.scales.dtype), len(prep_args),
               tuple(sorted(pre_statics.items())))
        pre = self._program(("df_pre", sig), lambda: AotProgram(
            depth_first_pre_frame, ("df_pre", sig), pre_statics))
        outs = pre(gi, view, proj, center, *prep_args)
        sort_ops = outs[:-4]
        slot_total, overflow, visible_count, row_total = outs[-4:]

        sort_statics = dict(num_keys=num_keys, is_stable=is_stable)
        sort_sig = ("df_sort", statics["capacity"], len(sort_ops), num_keys,
                    is_stable)
        sortp = self._program(sort_sig, lambda: AotProgram(
            sort_frame, sort_sig, sort_statics))
        sorted_ops = sortp(*sort_ops)
        sorted_key = sorted_ops[0]
        sw = sorted_ops[1 + drop:]

        post_sig = ("df_post", tuple(sorted(post_statics.items())))
        post = self._program(post_sig, lambda: AotProgram(
            depth_first_post_frame, post_sig, post_statics))
        return post(sorted_key, *sw, slot_total, overflow, visible_count,
                    row_total)


def _mono_render(self, gi, camera, width, height):
    """render() implementation shared by DepthFirstRenderer and
    HardwareRenderer (the latter overrides ``_mono_statics`` /
    ``_mono_key`` / ``_mono_capacity_factor`` — see pipelines/hardware.py).
    Auto-selects the 3-program split on real local TPU backends."""
    self.validate_inputs(gi, width, height)
    n = gi.count
    c = self.config
    view, proj, center = camera.astuple_jax()
    statics = dict(
        width=width, height=height,
        capacity=self.pick_capacity(n, self._mono_capacity_factor,
                                    kind=self._mono_key),
        sh_degree=min(c.sh_degree, {1: 0, 4: 1, 9: 2, 16: 3}[gi.sh_n_coeffs]),
        alpha_threshold=c.alpha_threshold,
        total_ink_threshold=c.total_ink_threshold,
        near_plane=camera.near_plane, far_plane=camera.far_plane,
        input_is_srgb=(c.gaussian_color_space == cfg.GaussianColorSpace.SRGB),
        tile_w=cfg.DEPTH_FIRST_TILE[0], tile_h=cfg.DEPTH_FIRST_TILE[1],
        depth_key_bits=c.depth_sort_key_precision.value,
        tile_id_bits=c.tile_id_precision.value,
        back_to_front=c.back_to_front,
        use_xla_blend=self.use_xla_blend,
    )
    statics.update(self._mono_statics())
    if not c.depth_output:
        # color-only frame: skip the depth accumulator/plane/assembly, the
        # reference's nil/.depth32Float depth-target skip
        # (DepthFirstRenderEncoder.swift:36-38)
        statics["depth_mode"] = "none"
    # per-row exact-span decomposition of oversized rects (RendererConfig.
    # row_expand; kernels/expand.row_expand_pallas): mono Pallas path with
    # 32-bit depth keys only, and only when the row-widened KeyPlan fits
    row_cap = 0
    if (c.row_expand and not self.use_xla_blend
            and statics.get("exact_tile_test", True) is True
            and statics["depth_key_bits"] == 32):
        row_cap = self.pick_row_capacity(n, kind=self._mono_key)
        _fk, kp_rows = _mono_key_statics(
            n, width=width, height=height,
            tile_w=statics["tile_w"], tile_h=statics["tile_h"],
            depth_key_bits=statics["depth_key_bits"],
            tile_id_bits=statics["tile_id_bits"],
            near_plane=statics["near_plane"],
            far_plane=statics["far_plane"], row_capacity=row_cap)
        if kp_rows is None:
            row_cap = 0
    statics["row_capacity"] = row_cap
    # per-input cached projection layout when the fused Pallas projection
    # kernel applies (kernels/project.prepare_projection_inputs: keeps the
    # ~0.7 ms pad/slice prologue out of the frame program)
    prep_args = ()
    if (not self.use_xla_blend
            and statics.get("exact_tile_test", True) is True
            and statics["depth_key_bits"] == 32):
        _fk, kp = _mono_key_statics(
            n, width=width, height=height,
            tile_w=statics["tile_w"], tile_h=statics["tile_h"],
            depth_key_bits=statics["depth_key_bits"],
            tile_id_bits=statics["tile_id_bits"],
            near_plane=statics["near_plane"],
            far_plane=statics["far_plane"])
        if kp is not None:
            from ..kernels.project import cached_projection_inputs
            prep_args = cached_projection_inputs(gi, statics["sh_degree"])
    split = self.split_frame
    if split is None:
        split = jax.default_backend() == "tpu"
    if not self.use_xla_blend and split:
        out = self._render_split(gi, view, proj, center, statics, n,
                                 prep_args)
    else:
        key = (self._mono_key, n, gi.sh_n_coeffs, str(gi.scales.dtype),
               len(prep_args), tuple(sorted(statics.items())))
        prog = self._program(
            key, lambda: AotProgram(depth_first_frame, key, statics))
        out = prog(gi, view, proj, center, *prep_args)
    self.note_frame(n, out.header, kind=self._mono_key)
    return self.finalize_output(out)


def depth_first_stereo_frame(
    gi: GaussianInput,
    views: Array, projs: Array, centers: Array, scene_transform: Array,
    comp: Array | None = None, harm: Array | None = None,
    *,
    width: int, height: int, capacity: int,
    sh_degree: int, alpha_threshold: float, total_ink_threshold: float,
    near_plane: float, far_plane: float, input_is_srgb: bool,
    tile_w: int = 16, tile_h: int = 16,
    depth_mode: str = "weighted",
    blocks_per_dma: int = 2,
    use_xla_blend: bool = False,
    interpret: bool = False,
):
    """Stereo side-by-side frame (encodeStereoPipeline equivalent,
    DepthFirstRenderer.swift:595-831): one shared instance list built from the
    union of both eyes' tile bounds, per-eye blending with an r^2 > 9 ellipse
    skip (DepthFirstShaders.metal:1825-1982), composited into an (H, 2W) image.

    ``depth_mode``/``blocks_per_dma`` parametrize the HardwareRenderer's stereo
    path (alpha-normalized depth resolve + backend submission granularity —
    HardwareGaussianShaders.metal:483-526, pipelines/hardware.py), which shares
    this frame program: the reference's HardwareRenderer stereo is likewise the
    center-eye depth sort + per-eye projection + dual-eye r^2 <= 9 blend
    (HardwareRenderer.swift:604-727, HardwareGaussianShaders.metal:170-303)."""
    from ..ops.project import stereo_project_and_cull

    tiles_x, tiles_y = cfg.tiles_for(width, height, tile_w, tile_h)
    num_tiles = tiles_x * tiles_y

    # Fused binning carrying BOTH eyes' records (8 words) through one sort.
    # Stereo instances cover the full union rect with a per-pixel r^2 <= 9
    # cutoff instead of an exact per-tile test (createInstancesStereoKernel
    # writes all union-rect tiles — DepthFirstShaders.metal:790-864); the
    # dual-eye r^2 <= 9 tile test at expansion is output-identical pruning
    # of union-rect instances whose ellipses miss the tile entirely (the
    # blend zeroes alpha past r^2 = 9; the reference skips those instances
    # per pixel instead — DepthFirstShaders.metal:1915-1935).
    key_plan = B.make_key_plan(num_tiles, gi.count,
                               near_plane=near_plane, far_plane=far_plane)
    if key_plan is not None and not use_xla_blend:
        # fused dual-eye Pallas projection (kernels/project.py)
        sort_ops, slot_total, overflow, visible_count, total_live = \
            _stereo_packed_ops(
                gi, views, projs, centers, scene_transform, comp, harm,
                key_plan, width=width, height=height, capacity=capacity,
                tiles_x=tiles_x, sh_degree=sh_degree,
                alpha_threshold=alpha_threshold,
                total_ink_threshold=total_ink_threshold,
                near_plane=near_plane, far_plane=far_plane,
                input_is_srgb=input_is_srgb, tile_w=tile_w, tile_h=tile_h,
                interpret=interpret)
        ops = jax.lax.sort(sort_ops, num_keys=2, is_stable=False)
        sorted_key, sw = ops[0], ops[2:]
        sorted_tile = binning_sorted_tile(
            sorted_key, fused_depth16=False,
            plan_tuple=key_plan.kernel_tuple)
    else:
        from .common import fused_binning_words
        pr = stereo_project_and_cull(
            gi, views, projs, centers,
            width=width, height=height, tile_w=tile_w, tile_h=tile_h,
            sh_degree=sh_degree, near_plane=near_plane, far_plane=far_plane,
            alpha_threshold=alpha_threshold,
            total_ink_threshold=total_ink_threshold,
            input_is_srgb=input_is_srgb, scene_transform=scene_transform,
        )
        words_l = pack_record_words(pr.record_left)
        words_r = pack_record_words(pr.record_right)
        word_list = ([words_l[:, k] for k in range(4)]
                     + [words_r[:, k] for k in range(4)])
        sorted_tile, sw, slot_total, overflow = fused_binning_words(
            pr.visible, pr.min_tx, pr.min_ty, pr.max_tx, pr.rect_count,
            pr.depth_key, word_list, capacity=capacity, tiles_x=tiles_x,
            fused_depth16=False, use_pallas=not use_xla_blend,
            interpret=interpret,
            exact_test="stereo", tile_w=tile_w, tile_h=tile_h,
            key_plan=key_plan)
        visible_count = jnp.sum(pr.visible).astype(jnp.int32)
        total_live = jnp.sum(
            jnp.where(pr.visible, pr.rect_count, 0)).astype(jnp.int32)
    starts, counts = B.extract_tile_ranges(sorted_tile, num_tiles)

    if use_xla_blend:
        eye_raster = []
        for eye_words in (sw[0:4], sw[4:8]):
            sorted_words = jnp.stack(eye_words, axis=-1)
            attrs = sorted_instance_attrs(
                sorted_words, sorted_tile, tiles_x=tiles_x, tile_w=tile_w,
                tile_h=tile_h, alpha_threshold=alpha_threshold,
                exact_tile_test=False)
            table = K.build_blend_table(attrs, capacity)
            eye_raster.append(K.blend_tiles_xla(
                table, starts, counts, tiles_x=tiles_x, tiles_y=tiles_y,
                max_per_tile=min(capacity, 4096),
                tile_w=tile_w, tile_h=tile_h,
                depth_mode=depth_mode, r2_cutoff=9.0))
    else:
        # single-pass dual-eye blend over the shared tile list (the sorted
        # words carry both eyes' records — depthFirstStereoRender,
        # DepthFirstShaders.metal:1825-1982)
        wtable = K.build_words_table(list(sw), capacity)
        eye_raster = K.blend_tiles_pallas(
            wtable, starts, counts, tiles_x=tiles_x, tiles_y=tiles_y,
            tile_w=tile_w, tile_h=tile_h, depth_mode=depth_mode,
            blocks_per_dma=blocks_per_dma, r2_cutoff=9.0,
            interpret=interpret, n_eyes=2)
    eyes = [K.assemble_image(tc, td, tiles_x=tiles_x, tiles_y=tiles_y,
                             width=width, height=height,
                             tile_w=tile_w, tile_h=tile_h)
            for tc, td in eye_raster]

    color = jnp.concatenate([eyes[0][0], eyes[1][0]], axis=1)  # (H, 2W, 4)
    depth = jnp.concatenate([eyes[0][1], eyes[1][1]], axis=1)

    header = FrameHeader(
        visible_count=visible_count,
        total_instances=total_live,
        overflow=overflow,
        slot_total=slot_total,
    )
    return RenderOutput(color=color, depth=depth, header=header)


def _stereo_packed_ops(gi, views, projs, centers, scene_transform, comp,
                       harm, key_plan, *, width, height, capacity, tiles_x,
                       sh_degree, alpha_threshold, total_ink_threshold,
                       near_plane, far_plane, input_is_srgb, tile_w, tile_h,
                       interpret):
    """Fused dual-eye Pallas projection + binning prep/expand up to the sort
    operands.  Returns (sort_ops, slot_total, overflow, visible_count,
    total_live)."""
    from ..kernels.project import stereo_project_and_cull_packed
    from ..ops.binning import unpack_rect_word

    with jax.named_scope("project_cull"):
        pp = stereo_project_and_cull_packed(
            gi, views, projs, centers, scene_transform,
            width=width, height=height, tile_w=tile_w, tile_h=tile_h,
            sh_degree=sh_degree, near_plane=near_plane, far_plane=far_plane,
            alpha_threshold=alpha_threshold,
            total_ink_threshold=total_ink_threshold,
            input_is_srgb=input_is_srgb, key_plan=key_plan,
            interpret=interpret,
            prepared=None if comp is None else (comp, harm))
    with jax.named_scope("binning_prep"):
        sort_ops, _spec, _plan, slot_total, overflow = binning_sort_operands(
            None, None, None, None, None, None, None,
            capacity=capacity, tiles_x=tiles_x, fused_depth16=False,
            use_pallas=True, interpret=interpret, exact_test="stereo",
            tile_w=tile_w, tile_h=tile_h, key_plan=key_plan, packed=pp)
    visible_count = jnp.sum(pp.visible).astype(jnp.int32)
    _mtx, _mty, rect_w = unpack_rect_word(pp.rect_word)
    total_live = jnp.sum(jnp.where(pp.visible, rect_w * pp.rect_h,
                                   0)).astype(jnp.int32)
    return sort_ops, slot_total, overflow, visible_count, total_live


def depth_first_stereo_pre_frame(
    gi: GaussianInput,
    views: Array, projs: Array, centers: Array, scene_transform: Array,
    comp: Array | None = None, harm: Array | None = None,
    *,
    width: int, height: int, capacity: int,
    sh_degree: int, alpha_threshold: float, total_ink_threshold: float,
    near_plane: float, far_plane: float, input_is_srgb: bool,
    tile_w: int = 16, tile_h: int = 16,
    interpret: bool = False,
):
    """Program 1 of the stereo 3-program frame (see depth_first_pre_frame:
    the instance sort must own its program; stereo's 10-operand sort pays
    the composed-sort volume law hardest).  Returns (*sort_ops(10),
    slot_total, overflow, visible_count, total_live)."""
    from ..ops.project import stereo_project_and_cull

    tiles_x, tiles_y = cfg.tiles_for(width, height, tile_w, tile_h)
    num_tiles = tiles_x * tiles_y
    key_plan = B.make_key_plan(num_tiles, gi.count,
                               near_plane=near_plane, far_plane=far_plane)
    if key_plan is not None:
        # fused dual-eye Pallas projection (kernels/project.py)
        sort_ops, slot_total, overflow, visible_count, total_live = \
            _stereo_packed_ops(
                gi, views, projs, centers, scene_transform, comp, harm,
                key_plan, width=width, height=height, capacity=capacity,
                tiles_x=tiles_x, sh_degree=sh_degree,
                alpha_threshold=alpha_threshold,
                total_ink_threshold=total_ink_threshold,
                near_plane=near_plane, far_plane=far_plane,
                input_is_srgb=input_is_srgb, tile_w=tile_w, tile_h=tile_h,
                interpret=interpret)
        return (*sort_ops, slot_total, overflow, visible_count, total_live)

    pr = stereo_project_and_cull(
        gi, views, projs, centers,
        width=width, height=height, tile_w=tile_w, tile_h=tile_h,
        sh_degree=sh_degree, near_plane=near_plane, far_plane=far_plane,
        alpha_threshold=alpha_threshold,
        total_ink_threshold=total_ink_threshold,
        input_is_srgb=input_is_srgb, scene_transform=scene_transform,
    )
    words_l = pack_record_words(pr.record_left)
    words_r = pack_record_words(pr.record_right)
    word_list = ([words_l[:, k] for k in range(4)]
                 + [words_r[:, k] for k in range(4)])
    sort_ops, _spec, _plan, slot_total, overflow = binning_sort_operands(
        pr.visible, pr.min_tx, pr.min_ty, pr.max_tx, pr.rect_count,
        pr.depth_key, word_list, capacity=capacity, tiles_x=tiles_x,
        fused_depth16=False, use_pallas=True, interpret=interpret,
        exact_test="stereo", tile_w=tile_w, tile_h=tile_h,
        key_plan=key_plan)
    visible_count = jnp.sum(pr.visible).astype(jnp.int32)
    total_live = jnp.sum(
        jnp.where(pr.visible, pr.rect_count, 0)).astype(jnp.int32)
    return (*sort_ops, slot_total, overflow, visible_count, total_live)


def depth_first_stereo_post_frame(
    sorted_key: Array,
    w0: Array, w1: Array, w2: Array, w3: Array,
    w4: Array, w5: Array, w6: Array, w7: Array,
    slot_total: Array, overflow: Array, visible_count: Array,
    total_live: Array,
    *,
    width: int, height: int, capacity: int, n_gaussians: int,
    near_plane: float, far_plane: float,
    tile_w: int = 16, tile_h: int = 16,
    depth_mode: str = "weighted",
    blocks_per_dma: int = 2,
    interpret: bool = False,
):
    """Program 3 of the stereo frame: ranges -> dual-eye blend -> (H, 2W)."""
    tiles_x, tiles_y = cfg.tiles_for(width, height, tile_w, tile_h)
    num_tiles = tiles_x * tiles_y
    key_plan = B.make_key_plan(num_tiles, n_gaussians,
                               near_plane=near_plane, far_plane=far_plane)
    plan_tuple = key_plan.kernel_tuple if key_plan is not None else None
    sorted_tile = binning_sorted_tile(sorted_key, fused_depth16=False,
                                      plan_tuple=plan_tuple)
    starts, counts = B.extract_tile_ranges(sorted_tile, num_tiles)
    sw = (w0, w1, w2, w3, w4, w5, w6, w7)
    wtable = K.build_words_table(list(sw), capacity)
    eye_raster = K.blend_tiles_pallas(
        wtable, starts, counts, tiles_x=tiles_x, tiles_y=tiles_y,
        tile_w=tile_w, tile_h=tile_h, depth_mode=depth_mode,
        blocks_per_dma=blocks_per_dma, r2_cutoff=9.0,
        interpret=interpret, n_eyes=2)
    eyes = [K.assemble_image(tc, td, tiles_x=tiles_x, tiles_y=tiles_y,
                             width=width, height=height,
                             tile_w=tile_w, tile_h=tile_h)
            for tc, td in eye_raster]
    color = jnp.concatenate([eyes[0][0], eyes[1][0]], axis=1)
    depth = jnp.concatenate([eyes[0][1], eyes[1][1]], axis=1)
    header = FrameHeader(
        visible_count=visible_count,
        total_instances=total_live,
        overflow=overflow,
        slot_total=slot_total,
    )
    return RenderOutput(color=color, depth=depth, header=header)


def _stereo_render(self, gi, camera, width, height):
    """render_stereo implementation shared by DepthFirstRenderer and
    HardwareRenderer (the latter overrides ``_stereo_statics`` /
    ``_stereo_key`` for its normalized-depth resolve + backend granularity)."""
    self.validate_inputs(gi, width, height)
    n = gi.count
    c = self.config
    left = camera.left
    views, projs, centers, st = camera.astuple_jax()
    statics = dict(
        width=width, height=height,
        # stereo expands full union rects (createInstancesStereoKernel writes
        # all union-rect tiles): inflated capacity factor
        capacity=self.pick_capacity(n, cfg.FULL_RECT_CAPACITY_FACTOR,
                                    kind=self._stereo_key),
        sh_degree=min(c.sh_degree, {1: 0, 4: 1, 9: 2, 16: 3}[gi.sh_n_coeffs]),
        alpha_threshold=c.alpha_threshold,
        total_ink_threshold=c.total_ink_threshold,
        near_plane=left.near_plane, far_plane=left.far_plane,
        input_is_srgb=(c.gaussian_color_space == cfg.GaussianColorSpace.SRGB),
        use_xla_blend=self.use_xla_blend,
    )
    statics.update(self._stereo_statics())
    prep_args = _stereo_prep_args(self, gi, statics["width"],
                                  statics["height"], statics["near_plane"],
                                  statics["far_plane"],
                                  statics["sh_degree"], n)
    split = getattr(self, "split_frame", None)
    if split is None:
        split = jax.default_backend() == "tpu"
    if not self.use_xla_blend and split:
        out = _stereo_render_split(self, gi, views, projs, centers, st,
                                   statics, n, prep_args)
    else:
        key = (self._stereo_key, n, gi.sh_n_coeffs, str(gi.scales.dtype),
               len(prep_args), tuple(sorted(statics.items())))
        prog = self._program(
            key, lambda: AotProgram(depth_first_stereo_frame, key, statics))
        out = prog(gi, views, projs, centers, st, *prep_args)
    self.note_frame(n, out.header, kind=self._stereo_key)
    return self.finalize_output(out)


def _stereo_prep_args(self, gi, width, height, near_plane, far_plane,
                      sh_degree, n):
    """Cached projection-input planes when the fused dual-eye Pallas
    projection applies (kernels/project.prepare_projection_inputs)."""
    if self.use_xla_blend:
        return ()
    tiles_x, tiles_y = cfg.tiles_for(width, height, 16, 16)
    plan = B.make_key_plan(tiles_x * tiles_y, n,
                           near_plane=near_plane, far_plane=far_plane)
    if plan is None:
        return ()
    from ..kernels.project import cached_projection_inputs
    return cached_projection_inputs(gi, sh_degree)


def _stereo_render_split(self, gi, views, projs, centers, st, statics, n,
                         prep_args=()):
    """Stereo 3-program dispatch (pre | bare 10-operand sort | post) — the
    stereo analogue of DepthFirstRenderer._render_split."""
    pre_keys = ("width", "height", "capacity", "sh_degree",
                "alpha_threshold", "total_ink_threshold", "near_plane",
                "far_plane", "input_is_srgb")
    pre_statics = {k: statics[k] for k in pre_keys if k in statics}
    post_statics = dict(
        width=statics["width"], height=statics["height"],
        capacity=statics["capacity"], n_gaussians=n,
        near_plane=statics["near_plane"], far_plane=statics["far_plane"],
        depth_mode=statics.get("depth_mode", "weighted"),
        blocks_per_dma=statics.get("blocks_per_dma", 2))

    tiles_x, tiles_y = cfg.tiles_for(statics["width"], statics["height"],
                                     16, 16)
    key_plan = B.make_key_plan(tiles_x * tiles_y, n,
                               near_plane=statics["near_plane"],
                               far_plane=statics["far_plane"])
    if key_plan is not None:
        num_keys, is_stable, drop = 2, False, 1
    else:
        num_keys, is_stable, drop = 2, True, 1

    sig = (self._stereo_key, n, gi.sh_n_coeffs, str(gi.scales.dtype),
           len(prep_args), tuple(sorted(pre_statics.items())))
    pre = self._program(("dfs_pre", sig), lambda: AotProgram(
        depth_first_stereo_pre_frame, ("dfs_pre", sig), pre_statics))
    outs = pre(gi, views, projs, centers, st, *prep_args)
    sort_ops = outs[:-4]
    slot_total, overflow, visible_count, total_live = outs[-4:]

    sort_sig = ("dfs_sort", statics["capacity"], len(sort_ops), num_keys,
                is_stable)
    sortp = self._program(sort_sig, lambda: AotProgram(
        sort_frame, sort_sig, dict(num_keys=num_keys, is_stable=is_stable)))
    sorted_ops = sortp(*sort_ops)
    sorted_key = sorted_ops[0]
    sw = sorted_ops[1 + drop:]

    post_sig = (self._stereo_key, "dfs_post",
                tuple(sorted(post_statics.items())))
    post = self._program(post_sig, lambda: AotProgram(
        depth_first_stereo_post_frame, post_sig, post_statics))
    return post(sorted_key, *sw, slot_total, overflow, visible_count,
                total_live)


def _foveated_packed_ops(gi, views, projs, centers, scene_transform,
                         inv_fit, warp_bounds, comp, harm, key_plan, *,
                         display_width, display_height, capacity, tiles_x,
                         tiles_y, sh_degree, alpha_threshold,
                         total_ink_threshold, near_plane, far_plane,
                         input_is_srgb, tile_w, tile_h, foveated_lod,
                         interpret):
    """Fused dual-eye Pallas projection + warped re-binning up to the sort
    operands for the foveated frame.  Returns (sort_ops, slot_total,
    overflow, visible_count, total_live)."""
    from ..kernels.project import (PackedProjection,
                                   stereo_project_and_cull_packed)

    with jax.named_scope("project_cull"):
        pp = stereo_project_and_cull_packed(
            gi, views, projs, centers, scene_transform,
            width=display_width, height=display_height, tile_w=tile_w,
            tile_h=tile_h, sh_degree=sh_degree, near_plane=near_plane,
            far_plane=far_plane, alpha_threshold=alpha_threshold,
            total_ink_threshold=total_ink_threshold,
            input_is_srgb=input_is_srgb, key_plan=key_plan,
            interpret=interpret,
            prepared=None if comp is None else (comp, harm))

    # display PIXEL bounds -> physical tile rect via the fitted inverse warp
    def inv_map(v, axis):
        row = inv_fit[axis]
        lo, hi, margin = row[10], row[11], row[12]
        t = (v - lo) / (hi - lo) * 2.0 - 1.0
        acc = row[0]
        for k in range(1, 10):
            acc = acc * t + row[k]
        return acc, margin

    sx0, mx = inv_map(pp.px_min, 0)
    sx1, _ = inv_map(pp.px_max, 0)
    sy0, my = inv_map(pp.py_min, 1)
    sy1, _ = inv_map(pp.py_max, 1)
    inv_tw = 1.0 / float(tile_w)
    inv_th = 1.0 / float(tile_h)
    min_tx = jnp.clip(jnp.floor((sx0 - mx) * inv_tw).astype(jnp.int32),
                      0, tiles_x - 1)
    max_tx = jnp.clip(jnp.floor((sx1 + mx) * inv_tw).astype(jnp.int32),
                      0, tiles_x - 1)
    min_ty = jnp.clip(jnp.floor((sy0 - my) * inv_th).astype(jnp.int32),
                      0, tiles_y - 1)
    max_ty = jnp.clip(jnp.floor((sy1 + my) * inv_th).astype(jnp.int32),
                      0, tiles_y - 1)
    visible = pp.visible & (min_tx <= max_tx) & (min_ty <= max_ty)
    rect_count = jnp.where(
        visible, (max_tx - min_tx + 1) * (max_ty - min_ty + 1), 0
    ).astype(jnp.int32)
    # identical rect-word/rect-h construction to the XLA prep path
    rect_w = max_tx - min_tx + 1
    rect_word = B.pack_rect_word(min_tx, min_ty, rect_w)
    from ..kernels import expand as E
    rect_word = jnp.where(visible, rect_word,
                          rect_word | jnp.uint32(E.CULLED_BIT))
    rect_h = rect_count // jnp.maximum(rect_w, 1)
    warped = PackedProjection(rect_word=rect_word, rect_h=rect_h,
                              dsw=pp.dsw, words=pp.words, visible=visible)
    with jax.named_scope("binning_prep"):
        sort_ops, _spec, _plan, slot_total, overflow = binning_sort_operands(
            None, None, None, None, None, None, None,
            capacity=capacity, tiles_x=tiles_x, fused_depth16=False,
            use_pallas=True, interpret=interpret, exact_test="stereo",
            tile_w=tile_w, tile_h=tile_h, warped_bounds=warp_bounds,
            lod_min=foveated_lod, key_plan=key_plan, packed=warped)
    visible_count = jnp.sum(pp.visible).astype(jnp.int32)
    total_live = jnp.sum(rect_count).astype(jnp.int32)
    return sort_ops, slot_total, overflow, visible_count, total_live


def depth_first_stereo_foveated_frame(
    gi: GaussianInput,
    views: Array, projs: Array, centers: Array, scene_transform: Array,
    inv_fit: Array,
    coord_x: Array, coord_y: Array, warp_bounds: Array,
    comp: Array | None = None, harm: Array | None = None,
    *,
    display_width: int, display_height: int,
    render_width: int, render_height: int, capacity: int,
    sh_degree: int, alpha_threshold: float, total_ink_threshold: float,
    near_plane: float, far_plane: float, input_is_srgb: bool,
    tile_w: int = 16, tile_h: int = 16,
    depth_mode: str = "weighted",
    blocks_per_dma: int = 2,
    use_xla_blend: bool = False,
    interpret: bool = False,
    foveated_lod: float = 0.0,
):
    """TRUE foveated stereo: rasterize DIRECTLY into the reduced-rate physical
    target (the reference attaches an ``MTLRasterizationRateMap`` so the copy
    pass shades fewer fragments — DepthFirstStereoCopyEncoder.swift:28-100;
    here the blend kernel itself shades only physical pixels, whose
    display-space coordinates come from the warp tables).

    Projection/culling happen in display space; binning maps each gaussian's
    display tile rect to physical tiles through the conservative LUTs (the
    in-kernel dual-eye tile test then drops boundary-straddle slop); the
    blend evaluates alpha at the warped per-pixel display coordinates, so the
    blend cost scales with the PHYSICAL pixel count.

    Re-binning design note (measured): mapping display TILE rects through
    conservative tile-granular LUTs inflated instance counts ~2x (nearly
    every display tile straddles a physical tile boundary at gentle rates;
    194 ms vs 104 ms full-res stereo @ 1M/SH3).  Instead each gaussian's
    display PIXEL bounds map through a degree-9 polynomial fit of the inverse
    warp (``inv_fit``; +- fitted error margin — an XLA table gather would
    cost ~6 ns/element), keeping physical rects within ~4% of display rects;
    the in-kernel dual-eye tile test prunes the remainder.  Result: 100.6 ms vs
    102.5 ms full-res at a gentle (85%-pixel) rate map — the foveated frame
    is FASTER, with the advantage scaling as the rate map gets more
    aggressive.
    """
    from ..ops.project import stereo_project_and_cull

    tiles_x, tiles_y = cfg.tiles_for(render_width, render_height, tile_w, tile_h)
    num_tiles = tiles_x * tiles_y

    key_plan = B.make_key_plan(num_tiles, gi.count,
                               near_plane=near_plane, far_plane=far_plane)
    if key_plan is not None and not use_xla_blend:
        # fused dual-eye Pallas projection + warped re-binning
        sort_ops, slot_total, overflow, visible_count, total_live = \
            _foveated_packed_ops(
                gi, views, projs, centers, scene_transform, inv_fit,
                warp_bounds, comp, harm, key_plan,
                display_width=display_width, display_height=display_height,
                capacity=capacity, tiles_x=tiles_x, tiles_y=tiles_y,
                sh_degree=sh_degree, alpha_threshold=alpha_threshold,
                total_ink_threshold=total_ink_threshold,
                near_plane=near_plane, far_plane=far_plane,
                input_is_srgb=input_is_srgb, tile_w=tile_w, tile_h=tile_h,
                foveated_lod=foveated_lod, interpret=interpret)
        ops = jax.lax.sort(sort_ops, num_keys=2, is_stable=False)
        sorted_key, sw = ops[0], ops[2:]
        sorted_tile = binning_sorted_tile(
            sorted_key, fused_depth16=False,
            plan_tuple=key_plan.kernel_tuple)
        starts, counts = B.extract_tile_ranges(sorted_tile, num_tiles)
        wtable = K.build_words_table(list(sw), capacity)
        eye_raster = K.blend_tiles_pallas(
            wtable, starts, counts, tiles_x=tiles_x, tiles_y=tiles_y,
            tile_w=tile_w, tile_h=tile_h, depth_mode=depth_mode,
            blocks_per_dma=blocks_per_dma, r2_cutoff=9.0,
            interpret=interpret, pixel_coords=(coord_x, coord_y), n_eyes=2)
        eyes = [K.assemble_image(tc, td, tiles_x=tiles_x, tiles_y=tiles_y,
                                 width=render_width, height=render_height,
                                 tile_w=tile_w, tile_h=tile_h)
                for tc, td in eye_raster]
        color = jnp.concatenate([eyes[0][0], eyes[1][0]], axis=1)
        depth = jnp.concatenate([eyes[0][1], eyes[1][1]], axis=1)
        header = FrameHeader(
            visible_count=visible_count,
            total_instances=total_live,
            overflow=overflow,
            slot_total=slot_total,
        )
        return RenderOutput(color=color, depth=depth, header=header)

    pr = stereo_project_and_cull(
        gi, views, projs, centers,
        width=display_width, height=display_height, tile_w=tile_w,
        tile_h=tile_h, sh_degree=sh_degree, near_plane=near_plane,
        far_plane=far_plane, alpha_threshold=alpha_threshold,
        total_ink_threshold=total_ink_threshold,
        input_is_srgb=input_is_srgb, scene_transform=scene_transform,
    )

    # display PIXEL bounds -> physical tile rect via the fitted inverse warp
    # (see docstring): phys sample index = poly(normalized display coord)
    def inv_map(v, axis):
        row = inv_fit[axis]
        lo, hi, margin = row[10], row[11], row[12]
        t = (v - lo) / (hi - lo) * 2.0 - 1.0
        acc = row[0]
        for k in range(1, 10):
            acc = acc * t + row[k]
        return acc, margin

    sx0, mx = inv_map(pr.px_min, 0)
    sx1, _ = inv_map(pr.px_max, 0)
    sy0, my = inv_map(pr.py_min, 1)
    sy1, _ = inv_map(pr.py_max, 1)
    inv_tw = 1.0 / float(tile_w)
    inv_th = 1.0 / float(tile_h)
    min_tx = jnp.clip(jnp.floor((sx0 - mx) * inv_tw).astype(jnp.int32),
                      0, tiles_x - 1)
    max_tx = jnp.clip(jnp.floor((sx1 + mx) * inv_tw).astype(jnp.int32),
                      0, tiles_x - 1)
    min_ty = jnp.clip(jnp.floor((sy0 - my) * inv_th).astype(jnp.int32),
                      0, tiles_y - 1)
    max_ty = jnp.clip(jnp.floor((sy1 + my) * inv_th).astype(jnp.int32),
                      0, tiles_y - 1)
    visible = pr.visible & (min_tx <= max_tx) & (min_ty <= max_ty)
    rect_count = jnp.where(
        visible, (max_tx - min_tx + 1) * (max_ty - min_ty + 1), 0
    ).astype(jnp.int32)

    from .common import fused_binning_words
    from ..kernels import expand as E
    words_l = pack_record_words(pr.record_left)
    words_r = pack_record_words(pr.record_right)
    word_list = ([words_l[:, k] for k in range(4)]
                 + [words_r[:, k] for k in range(4)])
    # exact pre-count under the warp: dual-eye masks against the EXACT
    # boundary-table display rects — the same predicate the expand kernel
    # re-applies, restoring the reference's count-before-expansion
    # discipline the foveated path had to skip when the mask predicate was
    # display-space.  On the Pallas path the fused prep kernel computes the
    # boundary gathers + masks + offset scan + table in one pass
    # (fused_binning_words mode="warped"); the XLA oracle path builds the
    # same masks via the one-hot MXU gather (bitwise-equal) and passes them
    # as mask_override.
    mask_override = None
    if use_xla_blend:
        rect_w = max_tx - min_tx + 1
        rect_h = max_ty - min_ty + 1
        fxa = E.warped_bounds_gather(warp_bounds[0], min_tx, E.MASK_W + 1)
        fya = E.warped_bounds_gather(warp_bounds[1], min_ty, E.MASK_H + 1)
        fx = [fxa[:, d] for d in range(E.MASK_W + 1)]
        fy = [fya[:, d] for d in range(E.MASK_H + 1)]
        wmask, wcnt = E.stereo_warped_tile_masks(
            word_list[0:3], word_list[4:7], rect_w, rect_h, fx, fy,
            w3=word_list[3], lod_min=foveated_lod,
            tile_w=tile_w, tile_h=tile_h)
        eligible = visible & (rect_w <= E.MASK_W) & (rect_h <= E.MASK_H)
        mask_override = (wmask, wcnt, eligible)
    # dual-eye r^2 <= 9 test against the WARPED physical tile rects (the
    # boundary tables) — this kills the tile-granular inflation of the
    # conservative display->physical rect mapping, which otherwise makes the
    # foveated frame carry MORE instances than full-res stereo
    sorted_tile, sw, slot_total, overflow = fused_binning_words(
        visible, min_tx, min_ty, max_tx, rect_count,
        pr.depth_key, word_list, capacity=capacity, tiles_x=tiles_x,
        fused_depth16=False, use_pallas=not use_xla_blend, interpret=interpret,
        exact_test="stereo", tile_w=tile_w, tile_h=tile_h,
        warped_bounds=warp_bounds, mask_override=mask_override,
        lod_min=foveated_lod, key_plan=key_plan)
    starts, counts = B.extract_tile_ranges(sorted_tile, num_tiles)

    if use_xla_blend:
        eye_raster = []
        for eye_words in (sw[0:4], sw[4:8]):
            sorted_words = jnp.stack(eye_words, axis=-1)
            attrs = sorted_instance_attrs(
                sorted_words, sorted_tile, tiles_x=tiles_x, tile_w=tile_w,
                tile_h=tile_h, alpha_threshold=alpha_threshold,
                exact_tile_test=False)
            table = K.build_blend_table(attrs, capacity)
            eye_raster.append(K.blend_tiles_xla(
                table, starts, counts, tiles_x=tiles_x, tiles_y=tiles_y,
                max_per_tile=min(capacity, 4096), tile_w=tile_w, tile_h=tile_h,
                depth_mode=depth_mode,
                r2_cutoff=9.0, pixel_coords=(coord_x, coord_y)))
    else:
        # single-pass dual-eye blend (see depth_first_stereo_frame)
        wtable = K.build_words_table(list(sw), capacity)
        eye_raster = K.blend_tiles_pallas(
            wtable, starts, counts, tiles_x=tiles_x, tiles_y=tiles_y,
            tile_w=tile_w, tile_h=tile_h, depth_mode=depth_mode,
            blocks_per_dma=blocks_per_dma, r2_cutoff=9.0,
            interpret=interpret, pixel_coords=(coord_x, coord_y), n_eyes=2)
    eyes = [K.assemble_image(tc, td, tiles_x=tiles_x, tiles_y=tiles_y,
                             width=render_width, height=render_height,
                             tile_w=tile_w, tile_h=tile_h)
            for tc, td in eye_raster]

    color = jnp.concatenate([eyes[0][0], eyes[1][0]], axis=1)
    depth = jnp.concatenate([eyes[0][1], eyes[1][1]], axis=1)
    header = FrameHeader(
        visible_count=jnp.sum(pr.visible).astype(jnp.int32),
        total_instances=jnp.sum(jnp.where(visible, rect_count, 0)).astype(jnp.int32),
        overflow=overflow,
        slot_total=slot_total,
    )
    return RenderOutput(color=color, depth=depth, header=header)


def depth_first_stereo_foveated_pre_frame(
    gi: GaussianInput,
    views: Array, projs: Array, centers: Array, scene_transform: Array,
    inv_fit: Array, warp_bounds: Array,
    comp: Array | None = None, harm: Array | None = None,
    *,
    display_width: int, display_height: int,
    render_width: int, render_height: int, capacity: int,
    sh_degree: int, alpha_threshold: float, total_ink_threshold: float,
    near_plane: float, far_plane: float, input_is_srgb: bool,
    tile_w: int = 16, tile_h: int = 16,
    interpret: bool = False,
    foveated_lod: float = 0.0,
):
    """Program 1 of the foveated-stereo 3-program frame (see
    depth_first_pre_frame: the instance sort must own its program): stereo
    project + warped re-binning + fused warped prep/expand, stopping at the
    10 sort operands.  Returns (*sort_ops, slot_total, overflow,
    visible_count, total_live)."""
    from ..ops.project import stereo_project_and_cull
    from .common import binning_sort_operands

    _tx, _ty = cfg.tiles_for(render_width, render_height, tile_w, tile_h)
    _plan = B.make_key_plan(_tx * _ty, gi.count,
                            near_plane=near_plane, far_plane=far_plane)
    if _plan is not None:
        # fused dual-eye Pallas projection + warped re-binning
        sort_ops, slot_total, overflow, visible_count, total_live = \
            _foveated_packed_ops(
                gi, views, projs, centers, scene_transform, inv_fit,
                warp_bounds, comp, harm, _plan,
                display_width=display_width, display_height=display_height,
                capacity=capacity, tiles_x=_tx, tiles_y=_ty,
                sh_degree=sh_degree, alpha_threshold=alpha_threshold,
                total_ink_threshold=total_ink_threshold,
                near_plane=near_plane, far_plane=far_plane,
                input_is_srgb=input_is_srgb, tile_w=tile_w, tile_h=tile_h,
                foveated_lod=foveated_lod, interpret=interpret)
        return (*sort_ops, slot_total, overflow, visible_count, total_live)

    tiles_x, tiles_y = cfg.tiles_for(render_width, render_height,
                                     tile_w, tile_h)
    num_tiles = tiles_x * tiles_y
    pr = stereo_project_and_cull(
        gi, views, projs, centers,
        width=display_width, height=display_height, tile_w=tile_w,
        tile_h=tile_h, sh_degree=sh_degree, near_plane=near_plane,
        far_plane=far_plane, alpha_threshold=alpha_threshold,
        total_ink_threshold=total_ink_threshold,
        input_is_srgb=input_is_srgb, scene_transform=scene_transform,
    )

    def inv_map(v, axis):
        row = inv_fit[axis]
        lo, hi, margin = row[10], row[11], row[12]
        t = (v - lo) / (hi - lo) * 2.0 - 1.0
        acc = row[0]
        for k in range(1, 10):
            acc = acc * t + row[k]
        return acc, margin

    sx0, mx = inv_map(pr.px_min, 0)
    sx1, _ = inv_map(pr.px_max, 0)
    sy0, my = inv_map(pr.py_min, 1)
    sy1, _ = inv_map(pr.py_max, 1)
    inv_tw = 1.0 / float(tile_w)
    inv_th = 1.0 / float(tile_h)
    min_tx = jnp.clip(jnp.floor((sx0 - mx) * inv_tw).astype(jnp.int32),
                      0, tiles_x - 1)
    max_tx = jnp.clip(jnp.floor((sx1 + mx) * inv_tw).astype(jnp.int32),
                      0, tiles_x - 1)
    min_ty = jnp.clip(jnp.floor((sy0 - my) * inv_th).astype(jnp.int32),
                      0, tiles_y - 1)
    max_ty = jnp.clip(jnp.floor((sy1 + my) * inv_th).astype(jnp.int32),
                      0, tiles_y - 1)
    visible = pr.visible & (min_tx <= max_tx) & (min_ty <= max_ty)
    rect_count = jnp.where(
        visible, (max_tx - min_tx + 1) * (max_ty - min_ty + 1), 0
    ).astype(jnp.int32)

    words_l = pack_record_words(pr.record_left)
    words_r = pack_record_words(pr.record_right)
    word_list = ([words_l[:, k] for k in range(4)]
                 + [words_r[:, k] for k in range(4)])
    key_plan = B.make_key_plan(num_tiles, pr.depth_key.shape[0],
                               near_plane=near_plane, far_plane=far_plane)
    sort_ops, _spec, _plan, slot_total, overflow = binning_sort_operands(
        visible, min_tx, min_ty, max_tx, rect_count,
        pr.depth_key, word_list, capacity=capacity, tiles_x=tiles_x,
        fused_depth16=False, use_pallas=True, interpret=interpret,
        exact_test="stereo", tile_w=tile_w, tile_h=tile_h,
        warped_bounds=warp_bounds, lod_min=foveated_lod, key_plan=key_plan)
    visible_count = jnp.sum(pr.visible).astype(jnp.int32)
    total_live = jnp.sum(
        jnp.where(visible, rect_count, 0)).astype(jnp.int32)
    return (*sort_ops, slot_total, overflow, visible_count, total_live)


def depth_first_stereo_foveated_post_frame(
    sorted_key: Array,
    w0: Array, w1: Array, w2: Array, w3: Array,
    w4: Array, w5: Array, w6: Array, w7: Array,
    coord_x: Array, coord_y: Array,
    slot_total: Array, overflow: Array, visible_count: Array,
    total_live: Array,
    *,
    render_width: int, render_height: int, capacity: int, n_gaussians: int,
    near_plane: float, far_plane: float,
    tile_w: int = 16, tile_h: int = 16,
    depth_mode: str = "weighted",
    blocks_per_dma: int = 2,
    interpret: bool = False,
):
    """Program 3 of the foveated frame: ranges -> warped dual-eye blend ->
    (H_phys, 2W_phys)."""
    tiles_x, tiles_y = cfg.tiles_for(render_width, render_height,
                                     tile_w, tile_h)
    num_tiles = tiles_x * tiles_y
    key_plan = B.make_key_plan(num_tiles, n_gaussians,
                               near_plane=near_plane, far_plane=far_plane)
    plan_tuple = key_plan.kernel_tuple if key_plan is not None else None
    sorted_tile = binning_sorted_tile(sorted_key, fused_depth16=False,
                                      plan_tuple=plan_tuple)
    starts, counts = B.extract_tile_ranges(sorted_tile, num_tiles)
    sw = (w0, w1, w2, w3, w4, w5, w6, w7)
    wtable = K.build_words_table(list(sw), capacity)
    eye_raster = K.blend_tiles_pallas(
        wtable, starts, counts, tiles_x=tiles_x, tiles_y=tiles_y,
        tile_w=tile_w, tile_h=tile_h, depth_mode=depth_mode,
        blocks_per_dma=blocks_per_dma, r2_cutoff=9.0,
        interpret=interpret, pixel_coords=(coord_x, coord_y), n_eyes=2)
    eyes = [K.assemble_image(tc, td, tiles_x=tiles_x, tiles_y=tiles_y,
                             width=render_width, height=render_height,
                             tile_w=tile_w, tile_h=tile_h)
            for tc, td in eye_raster]
    color = jnp.concatenate([eyes[0][0], eyes[1][0]], axis=1)
    depth = jnp.concatenate([eyes[0][1], eyes[1][1]], axis=1)
    header = FrameHeader(
        visible_count=visible_count,
        total_instances=total_live,
        overflow=overflow,
        slot_total=slot_total,
    )
    return RenderOutput(color=color, depth=depth, header=header)


def _stereo_foveated_render_split(self, gi, views, projs, centers, st,
                                  tabs_dev, statics, n, prep_args=()):
    """Foveated-stereo 3-program dispatch (pre | bare 10-operand sort |
    post): the warp tables thread through pre (inv_fit + boundary tables)
    AND post (per-pixel display coordinates)."""
    inv_fit, coord_x, coord_y, warp_bounds = tabs_dev
    pre_keys = ("display_width", "display_height", "render_width",
                "render_height", "capacity", "sh_degree", "alpha_threshold",
                "total_ink_threshold", "near_plane", "far_plane",
                "input_is_srgb", "foveated_lod")
    pre_statics = {k: statics[k] for k in pre_keys if k in statics}
    post_statics = dict(
        render_width=statics["render_width"],
        render_height=statics["render_height"],
        capacity=statics["capacity"], n_gaussians=n,
        near_plane=statics["near_plane"], far_plane=statics["far_plane"],
        depth_mode=statics.get("depth_mode", "weighted"),
        blocks_per_dma=statics.get("blocks_per_dma", 2))

    tiles_x, tiles_y = cfg.tiles_for(statics["render_width"],
                                     statics["render_height"], 16, 16)
    key_plan = B.make_key_plan(tiles_x * tiles_y, n,
                               near_plane=statics["near_plane"],
                               far_plane=statics["far_plane"])
    if key_plan is not None:
        num_keys, is_stable, drop = 2, False, 1
    else:
        num_keys, is_stable, drop = 2, True, 1

    sig = (self._stereo_key, "fov", n, gi.sh_n_coeffs, str(gi.scales.dtype),
           len(prep_args), tuple(sorted(pre_statics.items())))
    pre = self._program(("dff_pre", sig), lambda: AotProgram(
        depth_first_stereo_foveated_pre_frame, ("dff_pre", sig),
        pre_statics))
    outs = pre(gi, views, projs, centers, st, inv_fit, warp_bounds,
               *prep_args)
    sort_ops = outs[:-4]
    slot_total, overflow, visible_count, total_live = outs[-4:]

    sort_sig = ("dff_sort", statics["capacity"], len(sort_ops), num_keys,
                is_stable)
    sortp = self._program(sort_sig, lambda: AotProgram(
        sort_frame, sort_sig, dict(num_keys=num_keys, is_stable=is_stable)))
    sorted_ops = sortp(*sort_ops)
    sorted_key = sorted_ops[0]
    sw = sorted_ops[1 + drop:]

    post_sig = (self._stereo_key, "dff_post",
                tuple(sorted(post_statics.items())))
    post = self._program(post_sig, lambda: AotProgram(
        depth_first_stereo_foveated_post_frame, post_sig, post_statics))
    return post(sorted_key, *sw, coord_x, coord_y, slot_total, overflow,
                visible_count, total_live)


def _stereo_foveated_render(self, gi, camera, target):
    """render_stereo_foveated implementation (see the method docstring) —
    shared by DepthFirstRenderer and HardwareRenderer (hardware statics via
    ``_stereo_statics``), with the 3-program split auto-selected on real
    local TPU backends (the warp tables thread through pre AND post)."""
    from ..stereo import foveated_raster_tables

    self.validate_inputs(gi, target.display_width, target.display_height)
    n = gi.count
    c = self.config
    left = camera.left
    views, projs, centers, st = camera.astuple_jax()
    # device copies of the warp tables, cached on the target (per-frame
    # uploads of ~100 KB of tables cost real time on tunneled backends)
    tabs_dev = target.__dict__.get("_jax_tabs")
    if tabs_dev is None:
        tabs = foveated_raster_tables(target)
        tabs_dev = tuple(jnp.asarray(tabs[k])
                         for k in ("inv_fit", "coord_x", "coord_y", "bounds"))
        target.__dict__["_jax_tabs"] = tabs_dev
    fov_kind = self._stereo_key + "_fov"
    statics = dict(
        display_width=target.display_width,
        display_height=target.display_height,
        render_width=target.render_width, render_height=target.render_height,
        capacity=self.pick_capacity(n, cfg.FULL_RECT_CAPACITY_FACTOR,
                                    kind=fov_kind),
        sh_degree=min(c.sh_degree, {1: 0, 4: 1, 9: 2, 16: 3}[gi.sh_n_coeffs]),
        alpha_threshold=c.alpha_threshold,
        total_ink_threshold=c.total_ink_threshold,
        near_plane=left.near_plane, far_plane=left.far_plane,
        input_is_srgb=(c.gaussian_color_space == cfg.GaussianColorSpace.SRGB),
        use_xla_blend=self.use_xla_blend,
        foveated_lod=c.foveated_lod,
    )
    statics.update(self._stereo_statics())
    prep_args = _stereo_prep_args(
        self, gi, statics["render_width"], statics["render_height"],
        statics["near_plane"], statics["far_plane"],
        statics["sh_degree"], n)
    split = getattr(self, "split_frame", None)
    if split is None:
        split = jax.default_backend() == "tpu"
    if not self.use_xla_blend and split:
        out = _stereo_foveated_render_split(self, gi, views, projs, centers,
                                            st, tabs_dev, statics, n,
                                            prep_args)
    else:
        key = (fov_kind, n, gi.sh_n_coeffs, str(gi.scales.dtype),
               len(prep_args), tuple(sorted(statics.items())))
        prog = self._program(
            key,
            lambda: AotProgram(depth_first_stereo_foveated_frame, key,
                               statics))
        out = prog(gi, views, projs, centers, st, *tabs_dev, *prep_args)
    self.note_frame(n, out.header, kind=fov_kind)
    return self.finalize_output(out)
