"""GlobalRenderer — single global (tile, depth) radix sort pipeline, tile 32x16.

Reference call stack (GlobalRenderer.swift:281-370): projectCull -> two-pass tile
assignment -> sort-key gen [tileId:16 | depthHalf^0x8000:16] -> global radix sort
-> headers + active tiles -> 32x16-tile render.

TPU-native flow: identical to the DepthFirst machinery except there is **no depth
pre-sort** — instances are emitted in input order and one sort over the fused
32-bit key [tile:16 | depth16:16] (SortKeyGenEncoder.swift:1-44,
GlobalShaders.metal:266-300) establishes (tile, depth) order directly.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from .. import config as cfg
from .. import mathlib as M
from ..camera import CameraParams
from ..kernels import blend as K
from ..ops import binning as B
from ..ops.project import project_and_cull
from ..types import FrameHeader, GaussianInput, RenderOutput
from .base import AotProgram, GaussianRenderer, instance_capacity
from .common import fused_binning, render_split16, sorted_instance_attrs

Array = Any


def global_frame(
    gi: GaussianInput,
    view: Array, proj: Array, center: Array,
    *,
    width: int, height: int, capacity: int,
    sh_degree: int, alpha_threshold: float, total_ink_threshold: float,
    near_plane: float, far_plane: float, input_is_srgb: bool,
    tile_w: int = 32, tile_h: int = 16,
    exact_tile_test: bool = True,
    back_to_front: bool = False,
    use_xla_blend: bool = False,
    interpret: bool = False,
):
    tiles_x, tiles_y = cfg.tiles_for(width, height, tile_w, tile_h)
    num_tiles = tiles_x * tiles_y
    if num_tiles > 0xFFFF:
        raise ValueError("GlobalRenderer tile id must fit 16 bits "
                         f"({num_tiles} tiles)")

    del back_to_front  # both blend orders yield identical radiance (hardware.py)
    if not use_xla_blend and exact_tile_test is True:
        # fused Pallas projection emitting the half-depth key directly —
        # 16-bit sort key per gaussian (GlobalShaders.metal:266-300), fused
        # into the sort key; emission in input order (no depth pre-sort)
        from .common import d16_packed_sorted
        sorted_tile, sw, slot_total, overflow, visible = d16_packed_sorted(
            gi, view, proj, center,
            width=width, height=height, capacity=capacity, tiles_x=tiles_x,
            sh_degree=sh_degree, alpha_threshold=alpha_threshold,
            total_ink_threshold=total_ink_threshold, near_plane=near_plane,
            far_plane=far_plane, input_is_srgb=input_is_srgb,
            tile_w=tile_w, tile_h=tile_h, interpret=interpret)
    else:
        pr = project_and_cull(
            gi, view, proj, center,
            width=width, height=height, tile_w=tile_w, tile_h=tile_h,
            sh_degree=sh_degree, near_plane=near_plane,
            far_plane=far_plane,
            alpha_threshold=alpha_threshold,
            total_ink_threshold=total_ink_threshold,
            input_is_srgb=input_is_srgb,
        )
        depth16 = M.half_depth_key16(pr.record.depth.astype(jnp.float32))
        sorted_tile, sorted_words, total_live, overflow, sw, slot_total = \
            fused_binning(
                pr, depth16, capacity=capacity, tiles_x=tiles_x,
                fused_depth16=True,
                use_pallas=not use_xla_blend, interpret=interpret,
                exact_test=exact_tile_test, tile_w=tile_w, tile_h=tile_h,
                alpha_threshold=alpha_threshold)
        visible = pr.visible

    starts, counts = B.extract_tile_ranges(sorted_tile, num_tiles)

    if use_xla_blend:
        attrs = sorted_instance_attrs(
            sorted_words, sorted_tile, tiles_x=tiles_x, tile_w=tile_w,
            tile_h=tile_h, alpha_threshold=alpha_threshold,
            exact_tile_test=False)
        table = K.build_blend_table(attrs, capacity)
        tc, td = K.blend_tiles_xla(table, starts, counts, tiles_x=tiles_x,
                                   tiles_y=tiles_y,
                                   max_per_tile=min(capacity, 4096),
                                   tile_w=tile_w, tile_h=tile_h)
    else:
        wtable = K.build_words_table(sw, capacity)
        tc, td = K.blend_tiles_pallas(wtable, starts, counts, tiles_x=tiles_x,
                                      tiles_y=tiles_y, tile_w=tile_w,
                                      tile_h=tile_h, interpret=interpret)
    color, depth = K.assemble_image(tc, td, tiles_x=tiles_x, tiles_y=tiles_y,
                                    width=width, height=height,
                                    tile_w=tile_w, tile_h=tile_h)

    header = FrameHeader(
        visible_count=jnp.sum(visible).astype(jnp.int32),
        # post-exact-test instance count (reference totalInstances semantics)
        total_instances=jnp.sum(counts).astype(jnp.int32),
        overflow=overflow,
        slot_total=slot_total,
    )
    return RenderOutput(color=color, depth=depth, header=header)


class GlobalRenderer(GaussianRenderer):
    """Global (tile, depth16) single-sort renderer, 32x16 tiles."""

    def render(self, gi: GaussianInput, camera: CameraParams,
               width: int, height: int) -> RenderOutput:
        self.validate_inputs(gi, width, height)
        n = gi.count
        c = self.config
        view, proj, center = camera.astuple_jax()
        statics = dict(
            width=width, height=height, capacity=self.pick_capacity(n),
            sh_degree=min(c.sh_degree, {1: 0, 4: 1, 9: 2, 16: 3}[gi.sh_n_coeffs]),
            alpha_threshold=c.alpha_threshold,
            total_ink_threshold=c.total_ink_threshold,
            near_plane=camera.near_plane, far_plane=camera.far_plane,
            input_is_srgb=(c.gaussian_color_space == cfg.GaussianColorSpace.SRGB),
            tile_w=cfg.GLOBAL_TILE[0], tile_h=cfg.GLOBAL_TILE[1],
            back_to_front=c.back_to_front,
            use_xla_blend=self.use_xla_blend,
        )
        split = getattr(self, "split_frame", None)
        if split is None:
            split = jax.default_backend() == "tpu"
        if not self.use_xla_blend and split:
            # 3-program split: the instance sort must own its program
            # (composed-sort pathology — pipelines/common.py)
            out = render_split16(self, "global", gi, view, proj, center,
                                 statics, n)
        else:
            key = ('global', n, gi.sh_n_coeffs, str(gi.scales.dtype),
                   tuple(sorted(statics.items())))
            prog = self._program(
                key, lambda: AotProgram(global_frame, key, statics))
            out = prog(gi, view, proj, center)
        self.note_frame(n, out.header)
        return self.finalize_output(out)
