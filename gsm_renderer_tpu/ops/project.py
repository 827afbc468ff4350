"""Project + cull stage (XLA vector math over all gaussians).

TPU-native equivalent of ``depthFirstProjectCullKernel`` / ``globalProjectCullKernel``
(reference: DepthFirstShaders.metal:46-233, GlobalShaders.metal:19-138): one fused
vectorized pass over N gaussians computing visibility, the quantized 16-byte render
record, tile-rect bounds and sortable depth keys.

Differences by design (idiomatic TPU, not a port):

* The reference counts exact touched tiles inside this kernel with a nested loop
  and atomically accumulates ``totalInstances``.  On TPU, the instance count uses
  the *full clamped rect* closed-form (``rect_w * rect_h``) and the exact per-tile
  ellipse test is applied later per-slot (see ``ops/binning.py``) — slots failing
  the exact test get a sentinel key and drop out of the tile ranges, yielding the
  same per-tile instance lists as the reference without any device-side loops.
* Quantize-then-derive discipline is preserved: conics used by binning and blending
  are derived from the quantized record exactly like the reference re-derives them
  from ``GaussianRenderData`` (DepthFirstShaders.metal:166-205).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from .. import mathlib as M
from ..types import GaussianInput, RenderRecord

Array = Any


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ProjectionResult:
    """Per-gaussian outputs of the project+cull stage (all length-N arrays)."""

    record: RenderRecord
    visible: Array      # (N,) bool — passed every cull
    min_tx: Array       # (N,) int32 (clamped, inclusive)
    max_tx: Array
    min_ty: Array
    max_ty: Array
    rect_count: Array   # (N,) int32 — rect_w * rect_h for visible gaussians else 0
    depth_key: Array    # (N,) uint32 sortable; 0xFFFFFFFF when culled


def project_and_cull(
    gi: GaussianInput,
    view: Array,
    proj: Array,
    camera_center: Array,
    *,
    width: int,
    height: int,
    tile_w: int,
    tile_h: int,
    sh_degree: int,
    near_plane: float,
    far_plane: float,
    alpha_threshold: float,
    total_ink_threshold: float,
    input_is_srgb: bool,
    scene_transform: Array | None = None,
) -> ProjectionResult:
    """Fused projection + culling + record quantization for N gaussians."""
    f32 = jnp.float32
    positions = gi.positions.astype(f32)
    if scene_transform is not None:
        positions = M.apply_mat4(scene_transform, positions)[..., :3]
    scales = gi.scales.astype(f32)
    opacity = gi.opacities.astype(f32)

    tiles_x, tiles_y = -(-width // tile_w), -(-height // tile_h)

    # Cull: scale (GaussianShared.h:719-722)
    alive = ~M.cull_by_scale(scales)

    # Projection (Z-sign agnostic, GaussianShared.h:199-234)
    view_pos, ndc, depth, in_front = M.project_points(positions, view, proj, near_plane)
    alive &= in_front
    alive &= ~M.cull_by_far_plane(depth, far_plane)
    screen = M.ndc_to_screen(ndc, float(width), float(height))

    # Opacity threshold (DepthFirstShaders.metal:93-99)
    alive &= opacity >= alpha_threshold

    # Covariance chain
    cov3d = M.build_covariance_3d(scales, gi.rotations.astype(f32))
    if scene_transform is not None:
        rot_s = scene_transform[:3, :3]
        cov3d = jnp.einsum("ij,njk,lk->nil", rot_s, cov3d, rot_s,
                           precision=jax.lax.Precision.HIGHEST)
    view_rot = view[:3, :3]
    cov2d = M.project_covariance_2d(cov3d, view_pos, view_rot, proj,
                                    float(width), float(height))
    cov2d = M.stabilize_covariance_2d(cov2d, float(width), float(height))

    theta, sigma1, sigma2, eig_ok = M.covariance_to_theta_sigmas(cov2d)
    alive &= eig_ok

    radius = 3.0 * jnp.maximum(sigma1, sigma2)
    alive &= ~M.cull_by_radius(radius)

    det2d = (cov2d[..., 0, 0] * cov2d[..., 1, 1]
             - 0.25 * (cov2d[..., 0, 1] + cov2d[..., 1, 0]) ** 2)
    alive &= ~M.cull_by_total_ink(opacity, det2d, depth, near_plane, far_plane,
                                  total_ink_threshold)

    obb = M.compute_obb_extents(cov2d, 3.0)
    alive &= ~M.cull_by_screen_bounds(screen, obb, float(width), float(height))

    # SH color (+0.5 clamp, optional sRGB decode — DepthFirstShaders.metal:139-141)
    color = M.compute_sh_color(gi.harmonics, positions, camera_center.astype(f32),
                               sh_degree)
    color = jnp.maximum(color + 0.5, 0.0)
    if input_is_srgb:
        color = M.srgb_to_linear(color)

    # Quantized record (GaussianRenderData semantics, BridgingTypes.h:75-84)
    record = RenderRecord(
        mean_x=screen[..., 0].astype(jnp.float16),
        mean_y=screen[..., 1].astype(jnp.float16),
        theta=M.pack_theta_u16(theta),
        sigma1=sigma1.astype(jnp.float16),
        sigma2=sigma2.astype(jnp.float16),
        depth=depth.astype(jnp.float16),
        color=jnp.clip(color * 255.0, 0.0, 255.0).astype(jnp.uint8),
        opacity=jnp.clip(opacity * 255.0, 0.0, 255.0).astype(jnp.uint8),
    )

    # Tile rect from OBB (GaussianShared.h:791-828)
    min_tx, max_tx, min_ty, max_ty = M.compute_tile_bounds(
        screen, obb, float(width), float(height), tile_w, tile_h, tiles_x, tiles_y)
    rect_valid = (min_tx <= max_tx) & (min_ty <= max_ty)
    alive &= rect_valid

    # d2 cutoff from the *quantized* opacity; gaussians whose quantized opacity
    # falls below tau contribute nothing (cutoff < 0 -> no tile passes).
    opacity_q = record.opacity.astype(f32) * (1.0 / 255.0)
    tau = max(alpha_threshold, 1e-12)
    d2_cutoff = M.compute_d2_cutoff(opacity_q, tau)
    alive &= d2_cutoff >= 0.0

    rect_w = (max_tx - min_tx + 1).astype(jnp.int32)
    rect_h = (max_ty - min_ty + 1).astype(jnp.int32)
    rect_count = jnp.where(alive, rect_w * rect_h, 0).astype(jnp.int32)

    depth_key = jnp.where(alive, M.float_to_sortable_uint(depth),
                          jnp.uint32(0xFFFFFFFF))

    return ProjectionResult(
        record=record,
        visible=alive,
        min_tx=jnp.where(alive, min_tx, 0),
        max_tx=jnp.where(alive, max_tx, -1),
        min_ty=jnp.where(alive, min_ty, 0),
        max_ty=jnp.where(alive, max_ty, -1),
        rect_count=rect_count,
        depth_key=depth_key,
    )


def derive_blend_attributes(record: RenderRecord):
    """Derive blending attributes from the quantized record.

    Returns a dict of (N,) float32 arrays:
      ``a1, b1, c1`` / ``a2, b2, c2`` — the two linear forms whose squares sum to
      the Mahalanobis quadratic: with u = a1*px + b1*py + c1 and
      v = a2*px + b2*py + c2 (absolute pixel coordinates), q = u^2 + v^2.
      ``r, g, b`` color in [0, 1]; ``op`` opacity in [0, 1]; ``depth``;
      ``mean_x, mean_y``.

    This is the TPU-native replacement for re-deriving the conic per gaussian per
    pixel in the render kernel (DepthFirstShaders.metal:1753-1759): expressing q as
    a sum of squared linear forms makes per-pixel evaluation a matmul on the MXU
    and is numerically stable (no large-term cancellation).
    """
    f32 = jnp.float32
    theta = M.unpack_theta_u16(record.theta)
    s1 = jnp.maximum(record.sigma1.astype(f32), 1e-4)
    s2 = jnp.maximum(record.sigma2.astype(f32), 1e-4)
    c = jnp.cos(theta)
    s = jnp.sin(theta)
    inv1 = 1.0 / s1
    inv2 = 1.0 / s2
    mx = record.mean_x.astype(f32)
    my = record.mean_y.astype(f32)
    # u = ((px-mx)*c + (py-my)*s) / s1 ; v = (-(px-mx)*s + (py-my)*c) / s2
    a1 = c * inv1
    b1 = s * inv1
    c1 = -(mx * c + my * s) * inv1
    a2 = -s * inv2
    b2 = c * inv2
    c2 = (mx * s - my * c) * inv2
    color = record.color.astype(f32) * (1.0 / 255.0)
    return {
        "a1": a1, "b1": b1, "c1": c1,
        "a2": a2, "b2": b2, "c2": c2,
        "r": color[..., 0], "g": color[..., 1], "b": color[..., 2],
        "op": record.opacity.astype(f32) * (1.0 / 255.0),
        "depth": record.depth.astype(f32),
        "mean_x": mx, "mean_y": my,
    }
