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

import functools
from typing import Any

import jax
import jax.numpy as jnp

from .. import config as cfg
from ..camera import CameraParams
from ..kernels import blend as K
from ..ops import binning as B
from ..ops.project import project_and_cull
from ..types import FrameHeader, GaussianInput, RenderOutput
from .base import GaussianRenderer, instance_capacity
from .common import pack_record_words, sorted_instance_attrs

Array = Any


def depth_first_frame(
    gi: GaussianInput,
    view: Array, proj: Array, center: Array,
    *,
    width: int, height: int, capacity: int,
    sh_degree: int, alpha_threshold: float, total_ink_threshold: float,
    near_plane: float, far_plane: float, input_is_srgb: bool,
    tile_w: int = 16, tile_h: int = 16,
    exact_tile_test: bool = True,
    back_to_front: bool = False,
    depth_key_bits: int = 32,
    max_per_tile: int = 0,
    use_xla_blend: bool = False,
    interpret: bool = False,
):
    """The complete DepthFirst frame program (jit-compatible; all kwargs static)."""
    tiles_x, tiles_y = cfg.tiles_for(width, height, tile_w, tile_h)
    num_tiles = tiles_x * tiles_y

    pr = project_and_cull(
        gi, view, proj, center,
        width=width, height=height, tile_w=tile_w, tile_h=tile_h,
        sh_degree=sh_degree, near_plane=near_plane, far_plane=far_plane,
        alpha_threshold=alpha_threshold, total_ink_threshold=total_ink_threshold,
        input_is_srgb=input_is_srgb,
    )

    depth_key = pr.depth_key
    if depth_key_bits == 16:
        # 16-bit key re-quantization (DF_DEPTH_KEY_16 function constant,
        # VisibilityCompactionEncoder.swift:29-34): half bits ^ 0x8000.
        from .. import mathlib as M
        dk16 = M.half_depth_key16(M.sortable_uint_to_float(depth_key))
        depth_key = jnp.where(pr.visible, dk16, jnp.uint32(0xFFFFFFFF))
    if back_to_front:
        depth_key = jnp.where(pr.visible, ~depth_key, jnp.uint32(0xFFFFFFFF))

    _, order = B.depth_order(depth_key)

    rect_word = B.pack_rect_word(pr.min_tx, pr.min_ty,
                                 (pr.max_tx - pr.min_tx + 1))
    words = pack_record_words(pr.record)

    counts_ordered = pr.rect_count[order]
    rect_word_ordered = rect_word[order]
    words_ordered = words[order]

    sm = B.build_slot_map(counts_ordered, capacity)
    tile_key = B.slot_tile_ids(sm, rect_word_ordered, tiles_x)
    sorted_key, sorted_rank = B.stable_sort_by_tile(tile_key, sm.rank)
    sorted_words = words_ordered[jnp.maximum(sorted_rank, 0)]

    attrs = sorted_instance_attrs(
        sorted_words, sorted_key, tiles_x=tiles_x, tile_w=tile_w, tile_h=tile_h,
        alpha_threshold=alpha_threshold, exact_tile_test=exact_tile_test)

    starts, counts = B.extract_tile_ranges(sorted_key, num_tiles)
    if max_per_tile > 0:
        # Local-renderer parity: silent per-tile drop past the fixed capacity
        # (LocalShaders.metal:660-664).
        counts = jnp.minimum(counts, max_per_tile)

    table = K.build_blend_table(attrs, capacity)
    if use_xla_blend:
        mpt = max_per_tile if max_per_tile > 0 else min(capacity, 4096)
        tc, td = K.blend_tiles_xla(table, starts, counts, tiles_x=tiles_x,
                                   tiles_y=tiles_y, max_per_tile=mpt,
                                   tile_w=tile_w, tile_h=tile_h)
    else:
        tc, td = K.blend_tiles_pallas(table, starts, counts, tiles_x=tiles_x,
                                      tiles_y=tiles_y, tile_w=tile_w,
                                      tile_h=tile_h, interpret=interpret)
    color, depth = K.assemble_image(tc, td, tiles_x=tiles_x, tiles_y=tiles_y,
                                    width=width, height=height,
                                    tile_w=tile_w, tile_h=tile_h)

    header = FrameHeader(
        visible_count=jnp.sum(pr.visible).astype(jnp.int32),
        total_instances=sm.total,
        overflow=sm.overflow,
    )
    return RenderOutput(color=color, depth=depth, header=header)


class DepthFirstRenderer(GaussianRenderer):
    """Flagship renderer: global depth sort + stable tile sort.

    API parity with the reference DepthFirstRenderer (DepthFirstRenderer.swift),
    including ``depth_sort_key_precision`` via RendererConfig.
    """

    def render(self, gi: GaussianInput, camera: CameraParams,
               width: int, height: int) -> RenderOutput:
        gi.validate()
        n = gi.count
        c = self.config
        key = ("df", n, gi.sh_n_coeffs, width, height, c, self.use_xla_blend,
               camera.near_plane, camera.far_plane)

        def build():
            capacity = instance_capacity(c, n)
            fn = functools.partial(
                depth_first_frame,
                width=width, height=height, capacity=capacity,
                sh_degree=min(c.sh_degree, {1: 0, 4: 1, 9: 2, 16: 3}[gi.sh_n_coeffs]),
                alpha_threshold=c.alpha_threshold,
                total_ink_threshold=c.total_ink_threshold,
                near_plane=camera.near_plane, far_plane=camera.far_plane,
                input_is_srgb=(c.gaussian_color_space == cfg.GaussianColorSpace.SRGB),
                tile_w=cfg.DEPTH_FIRST_TILE[0], tile_h=cfg.DEPTH_FIRST_TILE[1],
                depth_key_bits=c.depth_sort_key_precision.value,
                back_to_front=c.back_to_front,
                use_xla_blend=self.use_xla_blend,
            )
            return jax.jit(fn)

        prog = self._program(key, build)
        view, proj, center = camera.astuple_jax()
        return prog(gi, view, proj, center)
