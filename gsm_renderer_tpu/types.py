"""Core value types: gaussian inputs, quantized render records, headers, validation.

TPU-native equivalents of the reference's bridged structs (BridgingTypes.h) and the
public input/validation types (GaussianRendererProtocol.swift:9-26, 326-416).

Design note (not a port): the reference feeds byte-packed AoS buffers
(``PackedWorldGaussian`` 48 B / ``PackedWorldGaussianHalf`` 32 B) straight to Metal
kernels.  On TPU the efficient layout is SoA ``jnp`` arrays, so :class:`GaussianInput`
is an SoA pytree; :func:`pack_world_gaussians` / :func:`unpack_world_gaussians`
provide bit-compatible codecs for the reference byte layouts so existing assets and
buffers round-trip exactly.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .config import Precision, sh_components

Array = Any


class RendererError(ValueError):
    """Validation failure (reference: GaussianRendererProtocol.swift:274-324)."""


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GaussianInput:
    """SoA gaussian scene input.

    ``positions`` (N, 3) f32; ``scales`` (N, 3) and ``opacities`` (N,) in the input
    precision; ``rotations`` (N, 4) quaternion (x, y, z, w); ``harmonics``
    stored channel-planar as (3, n_coeffs, N) — the TPU-native layout (every SH
    op runs on (N,)-wide lanes; converting per frame would cost a ~190 MB
    transpose at 1M/SH3).  :func:`make_gaussian_input` accepts the natural
    (N, n_coeffs, 3) order and converts once at construction.

    Equivalent of ``GaussianInput`` (GaussianRendererProtocol.swift:9-26): the
    reference carries (worldBuffer, harmonicsBuffer, gaussianCount, shComponents).
    """

    positions: Array
    scales: Array
    rotations: Array
    opacities: Array
    harmonics: Array

    @property
    def count(self) -> int:
        return self.positions.shape[0]

    @property
    def sh_n_coeffs(self) -> int:
        return self.harmonics.shape[1]  # (3, n_coeffs, N)

    def validate(self) -> None:
        """Shape/size validation (BufferValidation, GaussianRendererProtocol.swift:326-416)."""
        n = self.positions.shape[0]
        checks = [
            (self.positions.shape, (n, 3), "positions"),
            (self.scales.shape, (n, 3), "scales"),
            (self.rotations.shape, (n, 4), "rotations"),
            (self.opacities.shape, (n,), "opacities"),
        ]
        for got, want, name in checks:
            if tuple(got) != tuple(want):
                raise RendererError(f"{name}: expected shape {want}, got {tuple(got)}")
        if (self.harmonics.ndim != 3 or self.harmonics.shape[0] != 3
                or self.harmonics.shape[2] != n):
            raise RendererError(
                f"harmonics: expected channel-planar (3, n_coeffs, N), got "
                f"{tuple(self.harmonics.shape)}"
            )
        if self.harmonics.shape[1] not in (1, 4, 9, 16):
            raise RendererError(
                f"harmonics: n_coeffs must be one of 1/4/9/16, got {self.harmonics.shape[1]}"
            )


def make_gaussian_input(positions, scales, rotations, opacities, harmonics,
                        precision: Precision = Precision.FLOAT32) -> GaussianInput:
    """Build a validated :class:`GaussianInput`, casting to the requested
    precision.  ``harmonics`` in the natural (N, n_coeffs, 3) order; stored
    channel-planar (3, n_coeffs, N)."""
    dt = jnp.float32 if precision == Precision.FLOAT32 else jnp.float16
    harmonics = np.asarray(harmonics)
    if harmonics.ndim == 3 and harmonics.shape[2] == 3 and harmonics.shape[0] != 3:
        harmonics = np.ascontiguousarray(harmonics.transpose(2, 1, 0))
    gi = GaussianInput(
        positions=jnp.asarray(positions, jnp.float32),
        scales=jnp.asarray(scales, dt),
        rotations=jnp.asarray(rotations, dt),
        opacities=jnp.asarray(opacities, dt),
        harmonics=jnp.asarray(harmonics, dt),
    )
    gi.validate()
    return gi


# --- Packed byte-layout codecs (host-side, numpy) --------------------------------

_PACKED_F32_DTYPE = np.dtype(
    [
        ("px", "<f4"), ("py", "<f4"), ("pz", "<f4"),
        ("opacity", "<f4"),
        ("sx", "<f4"), ("sy", "<f4"), ("sz", "<f4"),
        ("_pad0", "<f4"),
        ("rx", "<f4"), ("ry", "<f4"), ("rz", "<f4"), ("rw", "<f4"),
    ]
)  # 48 bytes — PackedWorldGaussian (BridgingTypes.h:57-64)

_PACKED_F16_DTYPE = np.dtype(
    [
        ("px", "<f4"), ("py", "<f4"), ("pz", "<f4"),
        ("opacity", "<f2"),
        ("sx", "<f2"), ("sy", "<f2"), ("sz", "<f2"),
        ("rx", "<f2"), ("ry", "<f2"), ("rz", "<f2"), ("rw", "<f2"),
        ("_pad0", "<f2"), ("_pad1", "<f2"),
    ]
)  # 32 bytes — PackedWorldGaussianHalf (BridgingTypes.h:66-73)


def unpack_world_gaussians(buf: bytes | np.ndarray, precision: Precision,
                           harmonics_buf: bytes | np.ndarray | None = None,
                           sh_degree: int = 0) -> GaussianInput:
    """Decode reference-layout packed byte buffers into an SoA GaussianInput.

    ``harmonics_buf`` is the planar per-channel SH buffer (count * n_coeffs * 3
    values, [R0..Rn, G0..Gn, B0..Bn] per gaussian) in f32 (FLOAT32) or f16 (FLOAT16).
    """
    dtype = _PACKED_F32_DTYPE if precision == Precision.FLOAT32 else _PACKED_F16_DTYPE
    if isinstance(buf, (bytes, bytearray, memoryview)):
        rec = np.frombuffer(buf, dtype=dtype)
    else:
        rec = np.ascontiguousarray(buf).view(dtype).reshape(-1)
    n = rec.shape[0]
    positions = np.stack([rec["px"], rec["py"], rec["pz"]], axis=-1).astype(np.float32)
    scales = np.stack([rec["sx"], rec["sy"], rec["sz"]], axis=-1)
    rotations = np.stack([rec["rx"], rec["ry"], rec["rz"], rec["rw"]], axis=-1)
    opacities = rec["opacity"]

    n_coeffs = sh_components(sh_degree)
    hdt = np.float32 if precision == Precision.FLOAT32 else np.float16
    if harmonics_buf is None:
        harmonics = np.zeros((n, n_coeffs, 3), hdt)
    else:
        flat = (np.frombuffer(harmonics_buf, dtype=hdt)
                if isinstance(harmonics_buf, (bytes, bytearray, memoryview))
                else np.asarray(harmonics_buf, hdt).reshape(-1))
        expected = n * n_coeffs * 3
        if flat.size != expected:
            raise RendererError(
                f"harmonics buffer: expected {expected} values "
                f"(count={n} x coeffs={n_coeffs} x 3), got {flat.size}"
            )
        # planar [R0..Rn, G0..Gn, B0..Bn] per gaussian -> (N, n_coeffs, 3)
        # (make_gaussian_input converts to channel-planar storage)
        harmonics = flat.reshape(n, 3, n_coeffs).transpose(0, 2, 1)
    return make_gaussian_input(positions, scales, rotations, opacities, harmonics,
                               precision)


def pack_world_gaussians(gi: GaussianInput, precision: Precision) -> tuple[bytes, bytes]:
    """Encode an SoA GaussianInput back into reference packed byte layouts.

    Returns (world_bytes, harmonics_bytes).
    """
    dtype = _PACKED_F32_DTYPE if precision == Precision.FLOAT32 else _PACKED_F16_DTYPE
    n = gi.count
    rec = np.zeros(n, dtype)
    pos = np.asarray(gi.positions, np.float32)
    rec["px"], rec["py"], rec["pz"] = pos[:, 0], pos[:, 1], pos[:, 2]
    sc = np.asarray(gi.scales)
    rec["sx"], rec["sy"], rec["sz"] = sc[:, 0], sc[:, 1], sc[:, 2]
    rot = np.asarray(gi.rotations)
    rec["rx"], rec["ry"], rec["rz"], rec["rw"] = rot[:, 0], rot[:, 1], rot[:, 2], rot[:, 3]
    rec["opacity"] = np.asarray(gi.opacities)
    hdt = np.float32 if precision == Precision.FLOAT32 else np.float16
    # stored (3, n_coeffs, N) -> reference layout (N, 3, n_coeffs) planar
    harm = np.asarray(gi.harmonics, hdt).transpose(2, 0, 1)
    return rec.tobytes(), np.ascontiguousarray(harm).tobytes()


# --- Quantized render record (GaussianRenderData, BridgingTypes.h:75-84) ---------

@jax.tree_util.register_dataclass
@dataclasses.dataclass
class RenderRecord:
    """SoA equivalent of the 16-byte ``GaussianRenderData`` record.

    Quantization matches the reference exactly: screen mean and sigmas as float16,
    theta as u16 in [0, pi), depth as float16, color and opacity as u8.  All later
    stages (tile-touch counting, instance expansion, blending) must read these
    quantized values — the quantize-then-count discipline the reference uses for
    bit-exact agreement between counting and expansion
    (DepthFirstShaders.metal:166-205).
    """

    mean_x: Array   # (N,) float16
    mean_y: Array   # (N,) float16
    theta: Array    # (N,) uint16
    sigma1: Array   # (N,) float16
    sigma2: Array   # (N,) float16
    depth: Array    # (N,) float16
    color: Array    # (N, 3) uint8
    opacity: Array  # (N,) uint8


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class FrameHeader:
    """Device-side frame counters (DepthFirstHeader, BridgingTypes.h:210-219).

    All fields are scalar int32 arrays living on device; ``overflow`` is set when a
    capacity clamp dropped instances (the frame still renders — graceful
    degradation exactly like the reference's overflow flags).
    """

    visible_count: Array
    total_instances: Array
    overflow: Array
    #: total emitted expansion slots (live instances + one sentinel slot per
    #: non-emitting gaussian) — the slot-space occupancy ``overflow`` is
    #: measured against; feeds adaptive capacity sizing (pipelines/base.py).
    #: The reference keeps the analogous padded counts in its GPU-side header
    #: (prepareDepthFirstDispatchKernel, DepthFirstShaders.metal:2174-2308).
    slot_total: Array | None = None
    #: virtual-row demand of the per-row exact-span decomposition
    #: (kernels/expand.row_expand_pallas) — feeds the adaptive row capacity;
    #: None (or -1 in split-frame plumbing) when the row path is off.
    row_total: Array | None = None


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class RenderOutput:
    """Frame output: color (H, W, 4) and optional depth (H, W), plus the header."""

    color: Array
    depth: Array
    header: FrameHeader
