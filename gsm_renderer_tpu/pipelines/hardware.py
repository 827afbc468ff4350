"""HardwareRenderer-equivalent — depth-sorted splatting without per-tile tests.

The reference HardwareRenderer (HardwareRenderer.swift:1-943) rasterizes
screen-space quads in globally depth-sorted order via mesh shaders or instanced
draws, with fixed-function blending and an r^2 <= 9 fragment cutoff
(HardwareGaussianShaders.metal:415-526, 771-780).  No rasterizer exists on a TPU,
so this pipeline reproduces the *semantics* computationally:

* one global depth sort (DepthRadixSortEncoder equivalent),
* instance coverage = the quad/OBB tile rect, **no** exact ellipse test
  (a rasterized quad covers its whole bounding box),
* per-pixel alpha cutoff at r^2 > 9 instead of list-level filtering,
* alpha-normalized depth output (postprocessFragmentShader semantics),
* ``back_to_front`` reverses traversal order; front-to-back with transmittance
  and back-to-front "over" compositing produce identical radiance, so both map
  to the same kernel with reversed emission order.

``backend`` (mesh_shaders / instanced): on the reference both backends draw the
same sorted splats and differ only in submission granularity (mesh: 64
gaussians per object threadgroup, HardwareGaussianShaders.metal:858-886;
instanced: 1024 splats per indexed instance, :631-682).  Here the analogue of
submission granularity is the blend kernel's DMA chunk: MESH_SHADERS streams
512-instance chunks (4 blocks), INSTANCED 1024-instance chunks (8 blocks,
matching the reference's 1024 splats/instance).  Identical output either way,
like the reference.
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
from .base import AotProgram, GaussianRenderer, instance_capacity
from .common import fused_binning, sorted_instance_attrs

Array = Any

R2_CUTOFF = 9.0  # fragment discard radius^2 (HardwareGaussianShaders.metal:771-780)


def hardware_frame(
    gi: GaussianInput,
    view: Array, proj: Array, center: Array,
    *,
    width: int, height: int, capacity: int,
    sh_degree: int, alpha_threshold: float, total_ink_threshold: float,
    near_plane: float, far_plane: float, input_is_srgb: bool,
    tile_w: int = 16, tile_h: int = 16,
    back_to_front: bool = False,
    blocks_per_dma: int = 4,
    use_xla_blend: bool = False,
    interpret: bool = False,
):
    tiles_x, tiles_y = cfg.tiles_for(width, height, tile_w, tile_h)
    num_tiles = tiles_x * tiles_y

    pr = project_and_cull(
        gi, view, proj, center,
        width=width, height=height, tile_w=tile_w, tile_h=tile_h,
        sh_degree=sh_degree, near_plane=near_plane, far_plane=far_plane,
        alpha_threshold=alpha_threshold, total_ink_threshold=total_ink_threshold,
        input_is_srgb=input_is_srgb,
    )

    # back_to_front: the reference reverses traversal and switches the blend
    # equation to "over" (HardwareRenderer.swift:793-803); the resulting radiance
    # weights a_i * prod_{nearer j}(1 - a_j) are algebraically identical to
    # front-to-back transmittance compositing, so both flags map to one program.
    del back_to_front

    key_plan = B.make_key_plan(num_tiles, pr.depth_key.shape[0],
                               near_plane=near_plane, far_plane=far_plane)
    sorted_tile, sorted_words, total_live, overflow, sw, slot_total = fused_binning(
        pr, pr.depth_key, capacity=capacity, tiles_x=tiles_x,
        fused_depth16=False, use_pallas=not use_xla_blend, interpret=interpret,
        key_plan=key_plan)

    starts, counts = B.extract_tile_ranges(sorted_tile, num_tiles)

    if use_xla_blend:
        # No exact per-tile test: quads cover their OBB rect; per-pixel r^2
        # cutoff happens in the blend.
        attrs = sorted_instance_attrs(
            sorted_words, sorted_tile, tiles_x=tiles_x, tile_w=tile_w,
            tile_h=tile_h, alpha_threshold=alpha_threshold,
            exact_tile_test=False)
        table = K.build_blend_table(attrs, capacity)
        tc, td = K.blend_tiles_xla(table, starts, counts, tiles_x=tiles_x,
                                   tiles_y=tiles_y,
                                   max_per_tile=min(capacity, 4096),
                                   tile_w=tile_w, tile_h=tile_h,
                                   depth_mode="normalized", r2_cutoff=R2_CUTOFF)
    else:
        wtable = K.build_words_table(sw, capacity)
        tc, td = K.blend_tiles_pallas(wtable, starts, counts, tiles_x=tiles_x,
                                      tiles_y=tiles_y, tile_w=tile_w,
                                      tile_h=tile_h, depth_mode="normalized",
                                      blocks_per_dma=blocks_per_dma,
                                      r2_cutoff=R2_CUTOFF, interpret=interpret)
    color, depth = K.assemble_image(tc, td, tiles_x=tiles_x, tiles_y=tiles_y,
                                    width=width, height=height,
                                    tile_w=tile_w, tile_h=tile_h)

    header = FrameHeader(
        visible_count=jnp.sum(pr.visible).astype(jnp.int32),
        total_instances=total_live,
        overflow=overflow,
        slot_total=slot_total,
    )
    return RenderOutput(color=color, depth=depth, header=header)


class HardwareRenderer(GaussianRenderer):
    """Hardware-rasterization-equivalent renderer (mesh/instanced backends),
    mono and stereo (HardwareRenderer.swift:360-386, 604-727)."""

    def render(self, gi: GaussianInput, camera: CameraParams,
               width: int, height: int) -> RenderOutput:
        self.validate_inputs(gi, width, height)
        n = gi.count
        c = self.config
        view, proj, center = camera.astuple_jax()
        statics = dict(
            width=width, height=height,
            # full-rect expansion (no exact test to count with): inflated
            # capacity factor relative to the exact-test pipelines
            capacity=self.pick_capacity(n, cfg.FULL_RECT_CAPACITY_FACTOR),
            sh_degree=min(c.sh_degree, {1: 0, 4: 1, 9: 2, 16: 3}[gi.sh_n_coeffs]),
            alpha_threshold=c.alpha_threshold,
            total_ink_threshold=c.total_ink_threshold,
            near_plane=camera.near_plane, far_plane=camera.far_plane,
            input_is_srgb=(c.gaussian_color_space == cfg.GaussianColorSpace.SRGB),
            back_to_front=c.back_to_front,
            # submission granularity (see module docstring): mesh = 512-instance
            # chunks, instanced = 1024 (the reference's splats-per-instance)
            blocks_per_dma=(8 if c.hardware_backend == cfg.HardwareBackend.INSTANCED
                            else 4),
            use_xla_blend=self.use_xla_blend,
        )
        key = ('hw', n, gi.sh_n_coeffs, str(gi.scales.dtype), tuple(sorted(statics.items())))
        prog = self._program(key, lambda: AotProgram(hardware_frame, key, statics))
        out = prog(gi, view, proj, center)
        self.note_frame(n, out.header)
        return out

    # Stereo (HardwareRenderer.swift:604-727): center-eye depth sort, per-eye
    # projection, dual-eye r^2 <= 9 blend into an (H, 2W) side-by-side target,
    # alpha-normalized depth resolve (postprocessFragmentShader,
    # HardwareGaussianShaders.metal:483-526).  Shares the stereo frame program
    # (pipelines/depth_first.py:depth_first_stereo_frame) with the
    # hardware-specific depth mode and submission granularity.
    _stereo_key = "hw_stereo"

    def _stereo_statics(self):
        return dict(
            depth_mode="normalized",
            blocks_per_dma=(8 if self.config.hardware_backend
                            == cfg.HardwareBackend.INSTANCED else 4),
        )

    def render_stereo(self, gi, camera, width, height):
        # function-level import: depth_first.py owns the shared stereo frame
        # program; importing it lazily avoids a module cycle
        from .depth_first import _stereo_render
        return _stereo_render(self, gi, camera, width, height)
