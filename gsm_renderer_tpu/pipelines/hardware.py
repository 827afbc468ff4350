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

from .. import config as cfg
from ..types import GaussianInput
from .depth_first import DepthFirstRenderer

Array = Any

R2_CUTOFF = 9.0  # fragment discard radius^2 (HardwareGaussianShaders.metal:771-780)


def hardware_frame(
    gi: GaussianInput,
    view: Array, proj: Array, center: Array,
    *,
    back_to_front: bool = False,
    blocks_per_dma: int = 4,
    **statics,
):
    """Single-program Hardware frame: the generalized DepthFirst frame with
    hardware statics (no exact per-tile test — quads cover their OBB rect —
    per-pixel r^2 <= 9 cutoff, alpha-normalized depth resolve).

    back_to_front: the reference reverses traversal and switches the blend
    equation to "over" (HardwareRenderer.swift:793-803); the resulting radiance
    weights a_i * prod_{nearer j}(1 - a_j) are algebraically identical to
    front-to-back transmittance compositing, so both flags map to one program.
    """
    from .depth_first import depth_first_frame

    return depth_first_frame(
        gi, view, proj, center,
        exact_tile_test=False, depth_mode="normalized", r2_cutoff=R2_CUTOFF,
        back_to_front=back_to_front, blocks_per_dma=blocks_per_dma, **statics)


class HardwareRenderer(DepthFirstRenderer):
    """Hardware-rasterization-equivalent renderer (mesh/instanced backends),
    mono, stereo and foveated stereo (HardwareRenderer.swift:360-386,
    604-727, 592-727 rasterization-rate-map attach).

    Shares the DepthFirst frame machinery (including the production
    3-program split — the composed-sort pathology hits Hardware HARDEST: its
    full-rect expansion has the biggest sort volume) with hardware statics:
    no exact per-tile test, per-pixel r^2 <= 9 cutoff, alpha-normalized
    depth, and backend submission granularity.
    """

    # mono program tag + full-rect capacity (no exact test to count with)
    _mono_key = "hw"
    _mono_capacity_factor = cfg.FULL_RECT_CAPACITY_FACTOR

    def _mono_statics(self):
        return dict(
            exact_tile_test=False,
            depth_mode="normalized",
            r2_cutoff=R2_CUTOFF,
            # submission granularity (see module docstring): mesh =
            # 512-instance chunks, instanced = 1024 (the reference's
            # splats-per-instance)
            blocks_per_dma=(8 if self.config.hardware_backend
                            == cfg.HardwareBackend.INSTANCED else 4),
        )

    # Stereo (HardwareRenderer.swift:604-727): center-eye depth sort, per-eye
    # projection, dual-eye r^2 <= 9 blend into an (H, 2W) side-by-side target,
    # alpha-normalized depth resolve (postprocessFragmentShader,
    # HardwareGaussianShaders.metal:483-526).  Shares the stereo frame program
    # (pipelines/depth_first.py:depth_first_stereo_frame) with the
    # hardware-specific depth mode and submission granularity.  Foveated
    # stereo (HardwareRenderer.swift:592-727 attaches the rasterization rate
    # map) likewise shares the true-foveated frame, inherited from
    # DepthFirstRenderer with these statics.
    _stereo_key = "hw_stereo"

    def _stereo_statics(self):
        return dict(
            depth_mode="normalized",
            blocks_per_dma=(8 if self.config.hardware_backend
                            == cfg.HardwareBackend.INSTANCED else 4),
        )
