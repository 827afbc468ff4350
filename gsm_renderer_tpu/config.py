"""Renderer configuration.

TPU-native equivalent of the reference's ``RendererConfig`` value struct
(reference: Sources/Renderer/Shared/GaussianRendererProtocol.swift:195-228) and the
renderer-specific init parameters (DepthFirstRenderer.swift:45-50,
HardwareRenderer.swift:267-272).  Where the reference uses Metal function constants
for compile-time kernel specialization (SH degree, precision, depth-key width), we
use static (hashable) dataclass fields passed as ``static_argnums`` to ``jax.jit``.
"""

from __future__ import annotations

import dataclasses
import enum


class Precision(enum.Enum):
    """World-gaussian input precision.

    ``FLOAT32`` corresponds to the 48-byte ``PackedWorldGaussian`` layout and float32
    spherical harmonics; ``FLOAT16`` to the 32-byte ``PackedWorldGaussianHalf`` layout
    and float16 harmonics (reference: BridgingTypes.h:57-73).
    """

    FLOAT32 = "float32"
    FLOAT16 = "float16"


class GaussianColorSpace(enum.Enum):
    """Color space of the SH-decoded gaussian color (GaussianRendererProtocol.swift:204-212)."""

    LINEAR = "linear"
    SRGB = "srgb"


class ColorFormat(enum.Enum):
    """Render-target texel format (GaussianRendererProtocol.swift:204-212;
    the reference renders rgba16Float color + r16Float depth targets —
    GlobalResources.swift:334-360).

    ``RGBA16_FLOAT`` (the reference default) returns float16 color/depth
    arrays — the blend still accumulates in float32 (better than the
    reference's half accumulators), quantized once at assembly.
    ``RGBA32_FLOAT`` returns the full-precision float32 arrays.
    """

    RGBA16_FLOAT = "rgba16Float"
    RGBA32_FLOAT = "rgba32Float"


class DepthSortKeyPrecision(enum.Enum):
    """Depth radix-sort key width (reference: DepthRadixSortEncoder.swift:13-25).

    ``BITS16`` re-quantizes depth keys to 16 bits (half bits, sign-flipped) before the
    depth sort; ``BITS32`` keeps the full sortable-uint32 float key.
    """

    BITS16 = 16
    BITS32 = 32


class TileIdPrecision(enum.Enum):
    """Instance tile-id width for the stable tile sort (DepthFirstRenderer.swift:45-50)."""

    BITS16 = 16
    BITS32 = 32


class HardwareBackend(enum.Enum):
    """Hardware-renderer backend selector (HardwareRenderer.swift:267-272).

    There is no rasterizer on a TPU; both backends share a depth-sorted splatting
    compute path and differ in submission granularity, like the reference's
    backends: ``MESH_SHADERS`` streams 512-instance blend chunks, ``INSTANCED``
    1024-instance chunks (the reference's 1024 splats per instanced draw).
    See pipelines/hardware.py.
    """

    MESH_SHADERS = "meshShaders"
    INSTANCED = "instanced"


# Hard constants mirrored from the reference (values, not code):
#   alpha threshold 1/200 = 0.005 (GlobalRenderer.swift:48)
#   total-ink threshold 2.0 (GlobalRenderer.swift:49)
#   max 2048 gaussians per tile for the Local renderer (LocalRenderer.swift:5-9)
DEFAULT_ALPHA_THRESHOLD = 0.005
DEFAULT_TOTAL_INK_THRESHOLD = 2.0
LOCAL_MAX_PER_TILE = 2048

# Instance capacity multiplier.  The reference uses maxInstances = 4 x
# maxGaussians (DepthFirstResources.swift:80-81), counting only exact-tested
# touched tiles at projection.  The exact-test pipelines (DepthFirst, Global,
# Local) now pre-count the same way (pipelines/common.py fused_binning_words
# precount + kernels/expand.py exact_tile_masks), so they share the
# reference's 4x sizing.  The Hardware pipeline expands full clamped rects
# (a rasterized quad covers its whole bounding box — no exact test exists to
# count with), so it keeps the inflated factor.
INSTANCE_CAPACITY_FACTOR = 4
FULL_RECT_CAPACITY_FACTOR = 8  # full-rect expanders: Hardware, stereo union
#                                rects, band-sharded multichip


@dataclasses.dataclass(frozen=True)
class RendererConfig:
    """Static configuration; hashable so it can be a ``jax.jit`` static argument.

    Defaults mirror the reference config: 6M gaussians, 1920x1080, fp16 input,
    sRGB decode off... see GaussianRendererProtocol.swift:195-228.
    """

    max_gaussians: int = 6_000_000
    max_width: int = 1920
    max_height: int = 1080
    precision: Precision = Precision.FLOAT16
    gaussian_color_space: GaussianColorSpace = GaussianColorSpace.LINEAR
    #: output texel format; RGBA32_FLOAT (default) returns f32 arrays,
    #: RGBA16_FLOAT returns f16 (the reference's rgba16Float targets)
    color_format: ColorFormat = ColorFormat.RGBA32_FLOAT
    back_to_front: bool = False

    # Per-renderer tuning (function-constant equivalents).
    sh_degree: int = 3  # 0..3; selects the SH evaluation specialization
    alpha_threshold: float = DEFAULT_ALPHA_THRESHOLD
    total_ink_threshold: float = DEFAULT_TOTAL_INK_THRESHOLD
    depth_sort_key_precision: DepthSortKeyPrecision = DepthSortKeyPrecision.BITS32
    tile_id_precision: TileIdPrecision = TileIdPrecision.BITS16
    hardware_backend: HardwareBackend = HardwareBackend.MESH_SHADERS

    # Static instance capacity (defaults to INSTANCE_CAPACITY_FACTOR * gaussian count
    # at trace time when 0 — see pipelines).
    max_instances: int = 0

    #: Per-row exact-span instance counting for oversized rects (DepthFirst
    #: mono Pallas path).  The reference exact-counts EVERY gaussian's touched
    #: tiles at projection (DepthFirstShaders.metal:181-219); the TPU's 8x4
    #: mask window covers small rects only, and the heavy tail's full-rect
    #: fallback slots dominate realistic scenes (2.29M of 7.07M slots dead at
    #: the BASELINE realistic-PLY row).  This decomposes each oversized rect
    #: into per-tile-row virtual rows with closed-form ellipse column spans
    #: (kernels/expand.row_expand_pallas) — bitwise-identical output, much
    #: smaller sort/blend volume.  Disable to fall back to full-rect
    #: expansion with the in-kernel exact test.
    row_expand: bool = True

    #: Optional depth output (DepthFirst family).  The reference skips the
    #: depth texture entirely when the caller passes none or a .depth32Float
    #: target (DepthFirstRenderEncoder.swift:36-38, 60-80); False here drops
    #: the blend kernel's depth accumulator column, the depth output plane
    #: and the (H, W) depth assembly, and ``RenderOutput.depth`` is None.
    depth_output: bool = True

    # Periphery LOD for foveated rendering (BEYOND reference parity; the
    # rate map only changes where the reference shades, not what it draws).
    # 0.0 = off (exact foveated output).  > 0: toward the periphery,
    # instances whose opacity-weighted display footprint falls below the
    # rate-scaled threshold are skipped — the fovea is always exact.  Units:
    # opacity * display px^2 (see kernels/expand.py stereo_warped_tile_masks);
    # typical splat footprints are tens of px^2, so useful values are ~10-100
    # (measured: <= 1.0 drops nothing at the bench scene).
    foveated_lod: float = 0.0

    def __post_init__(self):
        if not (0 <= self.sh_degree <= 3):
            raise ValueError(f"sh_degree must be in [0, 3], got {self.sh_degree}")
        if self.max_gaussians <= 0 or self.max_width <= 0 or self.max_height <= 0:
            raise ValueError("max_gaussians/max_width/max_height must be positive")


def sh_components(sh_degree: int) -> int:
    """Number of SH coefficients per channel for a degree (1, 4, 9 or 16)."""
    return (sh_degree + 1) ** 2


def tiles_for(width: int, height: int, tile_w: int, tile_h: int) -> tuple[int, int]:
    """Tile grid dimensions covering a ``width`` x ``height`` surface."""
    return (-(-width // tile_w), -(-height // tile_h))


# Tile shapes per pipeline (reference: GlobalRenderer.swift:74-75 uses 32x16;
# Local and DepthFirst use 16x16).
GLOBAL_TILE = (32, 16)  # (w, h)
LOCAL_TILE = (16, 16)
DEPTH_FIRST_TILE = (16, 16)
