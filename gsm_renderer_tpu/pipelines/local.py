"""LocalRenderer — per-tile binning with in-tile depth sort, tile 16x16.

Reference call stack (LocalRenderer.swift:1-270): projectStore+compact -> atomic
per-tile scatter (<= 2048 slots/tile) -> per-tile bitonic sort by
(depth16 << 16 | localIdx) -> tile render with "first significant hit" depth
semantics (LocalShaders.metal:529-537).

TPU-native flow: identical machinery to the Global pipeline (one stable sort by
[tile:16 | depth16:16] — equivalent output ordering to the reference's scatter +
per-tile bitonic sort, whose localIdx tiebreak makes the atomic scatter order
deterministic again), then:

* per-tile counts clamped to 2048 (the reference silently drops instances past
  the fixed per-tile capacity — LocalShaders.metal:660-664),
* blend depth output = depth of the first instance with alpha > 0.1.
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


def local_frame(
    gi: GaussianInput,
    view: Array, proj: Array, center: Array,
    *,
    width: int, height: int, capacity: int,
    sh_degree: int, alpha_threshold: float, total_ink_threshold: float,
    near_plane: float, far_plane: float, input_is_srgb: bool,
    tile_w: int = 16, tile_h: int = 16,
    max_per_tile: int = cfg.LOCAL_MAX_PER_TILE,
    use_xla_blend: bool = False,
    interpret: bool = False,
):
    tiles_x, tiles_y = cfg.tiles_for(width, height, tile_w, tile_h)
    num_tiles = tiles_x * tiles_y
    if num_tiles > 0xFFFF:
        raise ValueError(f"LocalRenderer tile id must fit 16 bits ({num_tiles})")

    if not use_xla_blend:
        # fused Pallas projection emitting the half-depth key directly
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
                exact_test=True, tile_w=tile_w, tile_h=tile_h,
                alpha_threshold=alpha_threshold)
        visible = pr.visible

    starts, counts = B.extract_tile_ranges(sorted_tile, num_tiles)
    # fixed per-tile capacity: silent drop past max_per_tile
    counts = jnp.minimum(counts, max_per_tile)

    if use_xla_blend:
        attrs = sorted_instance_attrs(
            sorted_words, sorted_tile, tiles_x=tiles_x, tile_w=tile_w,
            tile_h=tile_h, alpha_threshold=alpha_threshold,
            exact_tile_test=False)
        table = K.build_blend_table(attrs, capacity)
        tc, td = K.blend_tiles_xla(table, starts, counts, tiles_x=tiles_x,
                                   tiles_y=tiles_y, max_per_tile=max_per_tile,
                                   tile_w=tile_w, tile_h=tile_h,
                                   depth_mode="first_hit")
    else:
        wtable = K.build_words_table(sw, capacity)
        tc, td = K.blend_tiles_pallas(wtable, starts, counts, tiles_x=tiles_x,
                                      tiles_y=tiles_y, tile_w=tile_w,
                                      tile_h=tile_h, depth_mode="first_hit",
                                      interpret=interpret)
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


class LocalRenderer(GaussianRenderer):
    """Per-tile scatter + in-tile 16-bit-key sort renderer (mono only, like the
    reference — LocalRenderer.swift:108-123)."""

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
            tile_w=cfg.LOCAL_TILE[0], tile_h=cfg.LOCAL_TILE[1],
            use_xla_blend=self.use_xla_blend,
        )
        split = getattr(self, "split_frame", None)
        if split is None:
            split = jax.default_backend() == "tpu"
        if not self.use_xla_blend and split:
            # 3-program split with the Local first-hit depth + per-tile cap
            out = render_split16(self, "local", gi, view, proj, center,
                                 statics, n, depth_mode="first_hit",
                                 max_per_tile=cfg.LOCAL_MAX_PER_TILE)
        else:
            key = ('local', n, gi.sh_n_coeffs, str(gi.scales.dtype),
                   tuple(sorted(statics.items())))
            prog = self._program(
                key, lambda: AotProgram(local_frame, key, statics))
            out = prog(gi, view, proj, center)
        self.note_frame(n, out.header)
        return self.finalize_output(out)
