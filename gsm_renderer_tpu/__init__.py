"""gsm_renderer_tpu — a TPU-native real-time 3D Gaussian-Splatting render engine.

Built from scratch in JAX/Pallas with the capabilities of LuckyIYI/gsm-renderer
(Swift/Metal): packed world-gaussian inputs (float32 48 B / float16 32 B layouts),
SH color degrees 0-3, mono + stereo rendering to color+depth, and four
interchangeable pipeline strategies (Global, Local, DepthFirst, Hardware).
"""

from .camera import (CameraParams, StereoCameraParams, make_camera,
                     make_look_at, make_projection_matrix,
                     make_side_by_side_stereo)
from .config import (GaussianColorSpace, HardwareBackend, Precision,
                     RendererConfig, DepthSortKeyPrecision, TileIdPrecision)
from .types import (GaussianInput, RendererError, RenderOutput,
                    make_gaussian_input, pack_world_gaussians,
                    unpack_world_gaussians)
from .pipelines import (DepthFirstRenderer, GaussianRenderer, GlobalRenderer,
                        HardwareRenderer, LocalRenderer)

__version__ = "0.1.0"

__all__ = [
    "CameraParams", "StereoCameraParams", "make_camera", "make_look_at",
    "make_projection_matrix", "make_side_by_side_stereo",
    "GaussianColorSpace", "HardwareBackend", "Precision", "RendererConfig",
    "DepthSortKeyPrecision", "TileIdPrecision",
    "GaussianInput", "RendererError", "RenderOutput", "make_gaussian_input",
    "pack_world_gaussians", "unpack_world_gaussians",
    "DepthFirstRenderer", "GaussianRenderer", "GlobalRenderer",
    "HardwareRenderer", "LocalRenderer",
]
