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


#: adaptive-capacity sizing: next frame's capacity = margin x last frame's
#: slot total, rounded to coarse buckets (limits recompiles), never above the
#: full reference model.  The reference sorts only ``totalInstances`` elements
#: via GPU-side indirect dispatch (prepareDepthFirstDispatchKernel,
#: DepthFirstShaders.metal:2174-2308); XLA's static shapes make the sort cost
#: scale with the STATIC capacity instead, so tracking the workload size is
#: the TPU-native analogue.  On overflow the frame drops instances and sets
#: header.overflow exactly like the reference's capacity clamp, and the next
#: frame rebounds to the full model.  Margin A/B at the headline config
#: (same process, slot_total 2.88M): 1.10+bucket -> 3.28M cap, 26.1 ms;
#: 1.04 -> 3.00M cap, 24.8 ms; 1.01 measured identical to 1.04 — the sort
#: is element-count-bound, so every point of margin costs ~0.05 ms, and 4%
#: covers frame-to-frame drift between refresh reads.
ADAPTIVE_MARGIN = 1.04
#: frames between workload re-reads once a capacity is locked in: reading the
#: device header blocks on the in-flight frame (a full sync costs ~30 ms
#: through a tunneled backend, ~us locally), so steady-state frames reuse the
#: cached capacity and only every REFRESH-th frame pays the read
ADAPTIVE_REFRESH = 64


def instance_capacity(config: RendererConfig, n: int,
                      factor: int | None = None) -> int:
    """Static instance capacity: config override or ``factor`` x gaussians
    (default INSTANCE_CAPACITY_FACTOR — the reference's 4x model), padded to
    the expand-kernel block size.  Every gaussian owns at least one slot
    (culled ones get a sentinel slot), so the capacity is also floored at
    n + 1."""
    from ..config import INSTANCE_CAPACITY_FACTOR
    if factor is None:
        factor = INSTANCE_CAPACITY_FACTOR
    c = (config.max_instances if config.max_instances > 0 else factor * n)
    c = max(c, n + 1)
    return -(-c // 4096) * 4096


def unique_jit(frame_fn, key, **static_kwargs):
    """jit a frame function under a signature-unique name.

    The unique name keeps profiles readable and avoids same-name executable
    aliasing across signatures.
    """
    import functools as _ft

    bound = _ft.partial(frame_fn, **static_kwargs)

    def wrapper(*args):
        return bound(*args)

    tag = abs(hash(key)) % 10 ** 10
    wrapper.__name__ = f"{frame_fn.__name__}_{tag}"
    wrapper.__qualname__ = wrapper.__name__
    return jax.jit(wrapper)


_ALL_PROGRAMS: list = []  # keep compiled executables alive for process lifetime


class AotProgram:
    """Ahead-of-time compiled frame program.

    jax's jit dispatch fast path mis-binds executables once several frame
    programs coexist in a process on the CPU backend ("Execution supplied 8
    buffers but compiled program expected 9"); calling the AOT-compiled
    executable directly is immune, so renderers cache these instead of jitted
    callables.
    """

    def __init__(self, frame_fn, key, static_kwargs):
        self._frame_fn = frame_fn
        self._key = key
        self._statics = static_kwargs
        self._retry = 0
        self._jit = unique_jit(frame_fn, key, **static_kwargs)
        self._compiled = None
        _ALL_PROGRAMS.append(self)

    def __call__(self, *args):
        if self._compiled is None:
            self._compiled = self._jit.lower(*args).compile()
        try:
            return self._compiled(*args)
        except (TypeError, ValueError) as e:
            # jax 0.9.0 on CPU occasionally produces an executable whose lifted
            # constant arguments were dropped ("Execution supplied N buffers
            # but compiled program expected M" / "Computation compiled for N
            # inputs but called with M").  Retrace under a fresh name (the
            # poisoned lowering is cached) and retry.
            msg = str(e)
            if "buffers" not in msg and "inputs but called" not in msg:
                raise
            for attempt in range(3):
                self._retry += 1
                jax.clear_caches()
                self._jit = unique_jit(self._frame_fn,
                                       (self._key, "retry", self._retry),
                                       **self._statics)
                self._compiled = self._jit.lower(*args).compile()
                try:
                    return self._compiled(*args)
                except (TypeError, ValueError) as e2:
                    msg = str(e2)
                    if "buffers" not in msg and "inputs but called" not in msg:
                        raise
            raise


class GaussianRenderer:
    """Base renderer: program cache + timing."""

    #: subclass hook — builds the jitted frame callable for a static signature
    _frame_builder = None

    def __init__(self, config: RendererConfig | None = None, *,
                 use_xla_blend: bool | None = None,
                 adaptive_capacity: bool = True):
        self.config = config or RendererConfig()
        self._programs: dict = {}
        self.last_gpu_time: float | None = None
        #: feedback for adaptive capacity: (gaussian count, FrameHeader) of
        #: the previous frame, fetched asynchronously (no device sync)
        self.adaptive_capacity = adaptive_capacity
        self._cap_feedback = None
        self._cap_state = None
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

    # -- adaptive capacity --------------------------------------------------------

    def pick_capacity(self, n: int, factor: int | None = None,
                      kind: str = "mono") -> int:
        """Instance capacity for the next frame: the full model
        (``instance_capacity``) until workload feedback exists, then
        ADAPTIVE_MARGIN x the previous frame's slot total (bucketed).  An
        explicit ``config.max_instances`` disables adaptation, as does
        constructing the renderer with ``adaptive_capacity=False``."""
        full = instance_capacity(self.config, n, factor)
        if not self.adaptive_capacity or self.config.max_instances > 0:
            return full
        state = (self._cap_state or {}).get((kind, n))
        if state is not None and state["age"] < ADAPTIVE_REFRESH:
            state["age"] += 1
            return state["cap"]
        fb = (self._cap_feedback or {}).get((kind, n))
        if fb is None or fb.slot_total is None:
            return full
        try:
            # blocks on the feedback frame's completion — paid once at
            # lock-in and every ADAPTIVE_REFRESH frames thereafter.
            # slot_total is computed BEFORE the capacity clamp, so it is the
            # true demand even for an overflowed frame — adaptation both
            # shrinks under-full models and GROWS past them (the reference's
            # HardwareRenderer grows its resources 2x on demand the same
            # way, HardwareRenderer.swift:92-232), up to a 4x-of-model
            # memory ceiling.
            total = int(fb.slot_total)
        except Exception:
            return full
        cap = int(total * ADAPTIVE_MARGIN) + 4096
        # quantize to 1/32 of magnitude: bounds recompiles to ~32 buckets per
        # octave while keeping the slack under ~3%
        bucket = max(4096, 1 << max(cap.bit_length() - 5, 0))
        cap = max(min(-(-cap // bucket) * bucket, 4 * full), 4096)
        if self._cap_state is None:
            self._cap_state = {}
        self._cap_state[(kind, n)] = {"cap": cap, "age": 0}
        return cap

    #: full-model factor for the virtual-row capacity of the per-row
    #: exact-span decomposition (kernels/expand.row_expand_pallas): every
    #: gaussian owns >= 1 row and oversized rects own rect_h rows, so 2 x n
    #: covers a mean oversized-rect height of ~n/(n_oversized) extra rows
    #: (the realistic BASELINE PLY row demands ~1.6M rows at 1M gaussians).
    ROW_CAPACITY_FACTOR = 2

    def pick_row_capacity(self, n: int, kind: str = "mono") -> int:
        """Adaptive virtual-row capacity, same margin/bucket discipline as
        :meth:`pick_capacity` but sized from ``header.row_total``.

        Returns 0 — "run full-rect expansion instead" — when the measured
        row demand exceeds the 4x-of-model growth ceiling: unlike instance
        overflow (which the reference also clamps), row overflow has a
        lossless fallback, so pathological tails degrade for at most one
        refresh interval.  ``row_total`` is measured every frame even when
        the row path is off (it is ~5 cheap 1M-element ops), so the decision
        self-corrects in both directions."""
        full = -(-self.ROW_CAPACITY_FACTOR * n // 4096) * 4096
        if not self.adaptive_capacity:
            return full
        key = ("rows", kind, n)
        state = (self._cap_state or {}).get(key)
        if state is not None and state["age"] < ADAPTIVE_REFRESH:
            state["age"] += 1
            return state["cap"]
        fb = (self._cap_feedback or {}).get((kind, n))
        if fb is None or getattr(fb, "row_total", None) is None:
            return full
        try:
            total = int(fb.row_total)
        except Exception:
            return full
        if total < 0:  # demand unknown (frame predates the row machinery)
            return full
        if total > 4 * full:
            cap = 0  # tail too heavy for the ceiling: full-rect fallback
        else:
            cap = int(total * ADAPTIVE_MARGIN) + 4096
            bucket = max(4096, 1 << max(cap.bit_length() - 5, 0))
            cap = max(min(-(-cap // bucket) * bucket, 4 * full), 4096)
        if self._cap_state is None:
            self._cap_state = {}
        self._cap_state[key] = {"cap": cap, "age": 0}
        return cap

    def note_frame(self, n: int, header, kind: str = "mono") -> None:
        """Record workload feedback for :meth:`pick_capacity`, starting an
        ASYNC device->host fetch of the header scalars (completed by the time
        the next frame is keyed — no blocking sync on the frame path).

        Sizing reads ``header.slot_total`` (the unclamped slot-space
        occupancy); headers without it are recorded but never shrink the
        capacity."""
        if not self.adaptive_capacity:
            return
        leaves = [header.overflow]
        if header.slot_total is not None:
            leaves.append(header.slot_total)
        if getattr(header, "row_total", None) is not None:
            leaves.append(header.row_total)
        for leaf in leaves:
            try:
                leaf.copy_to_host_async()
            except Exception:
                pass
        if self._cap_feedback is None:
            self._cap_feedback = {}
        self._cap_feedback[(kind, n)] = header

    # -- public API ---------------------------------------------------------------

    def validate_inputs(self, gi: GaussianInput, width: int, height: int) -> None:
        """Input validation against the configured limits — the equivalent of
        ``BufferValidation.validate`` throwing ``RendererError``
        (GaussianRendererProtocol.swift:326-416)."""
        from ..types import RendererError
        gi.validate()
        c = self.config
        if gi.count > c.max_gaussians:
            raise RendererError(
                f"gaussian count {gi.count} exceeds config.max_gaussians "
                f"{c.max_gaussians}")
        if width <= 0 or height <= 0:
            raise RendererError(f"invalid render size {width}x{height}")
        if width > c.max_width or height > c.max_height:
            raise RendererError(
                f"render size {width}x{height} exceeds configured maximum "
                f"{c.max_width}x{c.max_height}")

    def finalize_output(self, out: RenderOutput) -> RenderOutput:
        """Apply the configured output texel format (RendererConfig.
        color_format — the reference's rgba16Float/r16Float render targets,
        GaussianRendererProtocol.swift:204-212, GlobalResources.swift:
        334-360).  The blend accumulates in float32 either way; RGBA16_FLOAT
        quantizes once here."""
        from ..config import ColorFormat
        if self.config.color_format == ColorFormat.RGBA16_FLOAT:
            return RenderOutput(color=out.color.astype(jnp.float16),
                                depth=(None if out.depth is None
                                       else out.depth.astype(jnp.float16)),
                                header=out.header)
        return out

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
