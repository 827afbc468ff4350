"""Renderer protocol and the shared frame-program builder.

Equivalent of the ``GaussianRenderer`` protocol
(GaussianRendererProtocol.swift:243-272): ``render`` / ``render_stereo`` plus
``last_gpu_time``.  Where the reference's four renderer classes each encode a DAG
of Metal compute passes, each TPU renderer builds (and caches) one jitted frame
program per (count, resolution, statics) signature.
"""

from __future__ import annotations

import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..camera import CameraParams, StereoCameraParams
from ..config import RendererConfig
from ..types import GaussianInput, RenderOutput

Array = Any


def instance_capacity(config: RendererConfig, n: int) -> int:
    """Static instance capacity: config override or INSTANCE_CAPACITY_FACTOR x
    gaussians, padded to a 128-lane multiple."""
    from ..config import INSTANCE_CAPACITY_FACTOR
    c = (config.max_instances if config.max_instances > 0
         else INSTANCE_CAPACITY_FACTOR * n)
    return -(-c // 128) * 128


class GaussianRenderer:
    """Base renderer: program cache + timing."""

    #: subclass hook — builds the jitted frame callable for a static signature
    _frame_builder = None

    def __init__(self, config: RendererConfig | None = None, *,
                 use_xla_blend: bool | None = None):
        self.config = config or RendererConfig()
        self._programs: dict = {}
        self.last_gpu_time: float | None = None
        # default: Pallas blend on TPU, XLA reference blend elsewhere (the Pallas
        # kernel requires Mosaic; interpret mode is too slow beyond toy sizes).
        if use_xla_blend is None:
            use_xla_blend = jax.default_backend() not in ("tpu", "axon")
        self.use_xla_blend = use_xla_blend

    # -- program cache ------------------------------------------------------------

    def _program(self, key, builder):
        prog = self._programs.get(key)
        if prog is None:
            prog = builder()
            self._programs[key] = prog
        return prog

    # -- public API ---------------------------------------------------------------

    def render(self, gi: GaussianInput, camera: CameraParams,
               width: int, height: int) -> RenderOutput:
        raise NotImplementedError

    def render_stereo(self, gi: GaussianInput, camera: StereoCameraParams,
                      width: int, height: int) -> RenderOutput:
        raise NotImplementedError(
            f"{type(self).__name__} does not support stereo rendering")

    def render_timed(self, gi, camera, width, height) -> RenderOutput:
        """render() + wall-clock device time into ``last_gpu_time`` (the reference
        protocol exposes lastGPUTime — GaussianRendererProtocol.swift:246)."""
        t0 = time.perf_counter()
        out = self.render(gi, camera, width, height)
        jax.block_until_ready(out.color)
        np.asarray(out.header.overflow)  # hard sync (fetch) for remote backends
        self.last_gpu_time = time.perf_counter() - t0
        return out
