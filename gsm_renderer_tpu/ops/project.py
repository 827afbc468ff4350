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
    """Fused projection + culling + record quantization for N gaussians.

    Fully component-SoA: positions/scales/rotations are sliced ONCE into (N,)
    lane vectors and every subsequent op runs full-width on the VPU ((N, 3) /
    (N, 4) / (N, 3, 3)-shaped intermediates put tiny dims on the lane axis and
    waste 121+/128 lanes per op).
    """
    f32 = jnp.float32
    px = gi.positions[..., 0].astype(f32)
    py = gi.positions[..., 1].astype(f32)
    pz = gi.positions[..., 2].astype(f32)
    if scene_transform is not None:
        px, py, pz, _ = M.apply_mat4_c(scene_transform, px, py, pz)
    sx = gi.scales[..., 0].astype(f32)
    sy = gi.scales[..., 1].astype(f32)
    sz = gi.scales[..., 2].astype(f32)
    opacity = gi.opacities.astype(f32)

    tiles_x, tiles_y = -(-width // tile_w), -(-height // tile_h)

    # Cull: scale (GaussianShared.h:719-722)
    alive = ~M.cull_by_scale_c(sx, sy, sz)

    # Projection (Z-sign agnostic, GaussianShared.h:199-234)
    vx, vy, vz, nx, ny, depth, in_front = M.project_points_c(
        px, py, pz, view, proj, near_plane)
    alive &= in_front
    alive &= ~M.cull_by_far_plane(depth, far_plane)
    screen_x = (nx + 1.0) * (0.5 * width)
    screen_y = (ny + 1.0) * (0.5 * height)

    # Opacity threshold (DepthFirstShaders.metal:93-99)
    alive &= opacity >= alpha_threshold

    # Covariance chain (component form throughout)
    c3d = M.build_covariance_3d_c(sx, sy, sz,
                                  gi.rotations[..., 0].astype(f32),
                                  gi.rotations[..., 1].astype(f32),
                                  gi.rotations[..., 2].astype(f32),
                                  gi.rotations[..., 3].astype(f32))
    if scene_transform is not None:
        rot_s = scene_transform[:3, :3]
        s00, s01, s02, s11, s12, s22 = c3d
        sym = [[s00, s01, s02], [s01, s11, s12], [s02, s12, s22]]
        # R_s @ cov3d @ R_s^T, written elementwise (see mathlib on batched einsum)
        tmp = [[sum(rot_s[i, k] * sym[k][j] for k in range(3))
                for j in range(3)] for i in range(3)]

        def rotated(i, j):
            return sum(tmp[i][k] * rot_s[j, k] for k in range(3))

        c3d = (rotated(0, 0), rotated(0, 1), rotated(0, 2),
               rotated(1, 1), rotated(1, 2), rotated(2, 2))
    ca, cb, cd = M.project_covariance_2d_c(c3d, vx, vy, vz, view[:3, :3], proj,
                                           float(width), float(height))
    ca, cb, cd = M.stabilize_covariance_2d_c(ca, cb, cd, float(width),
                                             float(height))

    theta, sigma1, sigma2, eig_ok = M.covariance_to_theta_sigmas_c(ca, cb, cd)
    alive &= eig_ok

    radius = 3.0 * jnp.maximum(sigma1, sigma2)
    alive &= ~M.cull_by_radius(radius)

    det2d = ca * cd - cb * cb
    alive &= ~M.cull_by_total_ink(opacity, det2d, depth, near_plane, far_plane,
                                  total_ink_threshold)

    obb_x, obb_y = M.compute_obb_extents_c(ca, cb, cd, 3.0)
    alive &= ~M.cull_by_screen_bounds_c(screen_x, screen_y, obb_x, obb_y,
                                        float(width), float(height))

    # SH color (+0.5 clamp, optional sRGB decode — DepthFirstShaders.metal:139-141)
    color = M.compute_sh_color_c(gi.harmonics, px, py, pz,
                                 camera_center.astype(f32), sh_degree)
    color = jnp.maximum(color + 0.5, 0.0)
    if input_is_srgb:
        color = M.srgb_to_linear(color)

    # Quantized record (GaussianRenderData semantics, BridgingTypes.h:75-84)
    record = RenderRecord(
        mean_x=screen_x.astype(jnp.float16),
        mean_y=screen_y.astype(jnp.float16),
        theta=M.pack_theta_u16(theta),
        sigma1=sigma1.astype(jnp.float16),
        sigma2=sigma2.astype(jnp.float16),
        depth=depth.astype(jnp.float16),
        color=jnp.clip(color * 255.0, 0.0, 255.0).astype(jnp.uint8),
        opacity=jnp.clip(opacity * 255.0, 0.0, 255.0).astype(jnp.uint8),
    )

    # Tile rect from OBB (GaussianShared.h:791-828)
    min_tx, max_tx, min_ty, max_ty = M.compute_tile_bounds_c(
        screen_x, screen_y, obb_x, obb_y, float(width), float(height),
        tile_w, tile_h, tiles_x, tiles_y)
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


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class StereoProjectionResult:
    """Per-gaussian outputs of the dual-eye project+cull stage.

    Equivalent of ``depthFirstStereoProjectCullKernel``
    (DepthFirstShaders.metal:341-513): per-eye quantized records (mean, theta,
    sigmas — the reference packs per-eye f16 conics in the 32-byte
    ``StereoTiledRenderData``; we keep the theta/sigma form used by the mono
    record, an equivalent parametrization of the same quantized ellipse),
    union tile bounds of both eyes, shared color/opacity from the mid camera,
    and a mean-depth sort key.
    """

    record_left: RenderRecord
    record_right: RenderRecord
    eye_visible: Array    # (2, N) bool
    visible: Array        # (N,) bool — visible in at least one eye + shared culls
    min_tx: Array         # union bounds (N,) int32
    max_tx: Array
    min_ty: Array
    max_ty: Array
    rect_count: Array     # (N,) int32 — full union rect (no per-tile test)
    depth_key: Array      # (N,) uint32 — sortable mean depth
    center_depth: Array   # (N,) float16
    px_min: Array         # (N,) f32 union PIXEL bounds (clamped to screen;
    px_max: Array         #   consumed by the foveated physical re-binning)
    py_min: Array
    py_max: Array


def _project_one_eye(pos_c, c3d, view, proj, width, height,
                     tile_w, tile_h, near_plane, far_plane):
    """Eye-dependent projection chain (component form; run once per eye).

    Mirrors ``projectToEye`` (DepthFirstShaders.metal:250-341): the covariance
    is built once in scene orientation (``c3d``, eye-independent — the scene
    scale is folded into the gaussian scale by the caller) and projected
    through each eye's view matrix here.
    """
    px, py, pz = pos_c
    tiles_x, tiles_y = -(-width // tile_w), -(-height // tile_h)

    vx, vy, vz, nx, ny, depth, in_front = M.project_points_c(
        px, py, pz, view, proj, near_plane)
    ok = in_front & ~M.cull_by_far_plane(depth, far_plane)
    screen_x = (nx + 1.0) * (0.5 * width)
    screen_y = (ny + 1.0) * (0.5 * height)

    ca, cb, cd = M.project_covariance_2d_c(c3d, vx, vy, vz, view[:3, :3],
                                           proj, float(width), float(height))
    ca, cb, cd = M.stabilize_covariance_2d_c(ca, cb, cd, float(width),
                                             float(height))
    theta, sigma1, sigma2, eig_ok = M.covariance_to_theta_sigmas_c(ca, cb, cd)
    ok &= eig_ok
    det2d = ca * cd - cb * cb

    radius = 3.0 * jnp.maximum(sigma1, sigma2)
    ok &= ~M.cull_by_radius(radius)
    obb_x, obb_y = M.compute_obb_extents_c(ca, cb, cd, 3.0)
    ok &= ~M.cull_by_screen_bounds_c(screen_x, screen_y, obb_x, obb_y,
                                     float(width), float(height))

    min_tx, max_tx, min_ty, max_ty = M.compute_tile_bounds_c(
        screen_x, screen_y, obb_x, obb_y, float(width), float(height),
        tile_w, tile_h, tiles_x, tiles_y)
    ok &= (min_tx <= max_tx) & (min_ty <= max_ty)
    return dict(screen_x=screen_x, screen_y=screen_y, depth=depth, theta=theta,
                sigma1=sigma1, sigma2=sigma2, det=det2d, visible=ok,
                min_tx=min_tx, max_tx=max_tx, min_ty=min_ty, max_ty=max_ty,
                px_min=jnp.clip(screen_x - obb_x, 0.0, float(width)),
                px_max=jnp.clip(screen_x + obb_x, 0.0, float(width)),
                py_min=jnp.clip(screen_y - obb_y, 0.0, float(height)),
                py_max=jnp.clip(screen_y + obb_y, 0.0, float(height)))


def stereo_project_and_cull(
    gi: GaussianInput,
    views: Array,   # (2, 4, 4) left/right view matrices
    projs: Array,   # (2, 4, 4)
    centers: Array, # (2, 3) eye world positions
    *,
    width: int, height: int, tile_w: int, tile_h: int,
    sh_degree: int, near_plane: float, far_plane: float,
    alpha_threshold: float, total_ink_threshold: float,
    input_is_srgb: bool,
    scene_transform: Array | None = None,
) -> StereoProjectionResult:
    f32 = jnp.float32
    if scene_transform is None:
        scene_transform = jnp.eye(4, dtype=f32)

    sx = gi.scales[..., 0].astype(f32)
    sy = gi.scales[..., 1].astype(f32)
    sz = gi.scales[..., 2].astype(f32)
    opacity = gi.opacities.astype(f32)
    shared_ok = ~M.cull_by_scale_c(sx, sy, sz)
    shared_ok &= opacity >= alpha_threshold

    # Eye-independent work ONCE: scene-transformed positions + covariance in
    # scene orientation with the scene scale folded into the gaussian scale
    # (projectToEye, DepthFirstShaders.metal:250-341).
    px, py, pz, _ = M.apply_mat4_c(scene_transform,
                                   gi.positions[..., 0].astype(f32),
                                   gi.positions[..., 1].astype(f32),
                                   gi.positions[..., 2].astype(f32))
    scene_scale = jnp.linalg.norm(scene_transform[:3, 0])
    c3d = M.build_covariance_3d_c(sx * scene_scale, sy * scene_scale,
                                  sz * scene_scale,
                                  gi.rotations[..., 0].astype(f32),
                                  gi.rotations[..., 1].astype(f32),
                                  gi.rotations[..., 2].astype(f32),
                                  gi.rotations[..., 3].astype(f32))

    per_eye = [
        _project_one_eye((px, py, pz), c3d, views[i].astype(f32),
                         projs[i].astype(f32), width, height, tile_w, tile_h,
                         near_plane, far_plane)
        for i in range(2)
    ]
    eye = {k: jnp.stack([per_eye[0][k], per_eye[1][k]]) for k in per_eye[0]}

    vis_l = eye["visible"][0] & shared_ok
    vis_r = eye["visible"][1] & shared_ok
    any_vis = vis_l | vis_r

    depth_l, depth_r = eye["depth"][0], eye["depth"][1]
    both = vis_l & vis_r
    check_depth = jnp.where(both, 0.5 * (depth_l + depth_r),
                            jnp.where(vis_l, depth_l, depth_r))
    det = jnp.where(both, jnp.maximum(eye["det"][0], eye["det"][1]),
                    jnp.where(vis_l, eye["det"][0], eye["det"][1]))
    any_vis &= ~M.cull_by_total_ink(opacity, det, check_depth, near_plane,
                                    far_plane, total_ink_threshold)

    # mid-camera SH color (DepthFirstShaders.metal:420-426)
    mid = 0.5 * (centers[0] + centers[1]).astype(f32)
    color = M.compute_sh_color_c(gi.harmonics, px, py, pz, mid, sh_degree)
    color = jnp.maximum(color + 0.5, 0.0)
    if input_is_srgb:
        color = M.srgb_to_linear(color)
    color_u8 = jnp.clip(color * 255.0, 0.0, 255.0).astype(jnp.uint8)
    op_u8 = jnp.clip(opacity * 255.0, 0.0, 255.0).astype(jnp.uint8)

    # union tile bounds over visible eyes
    big = jnp.int32(1 << 20)
    def pick(arr, vl, vr, reduce_min):
        a, b = arr[0], arr[1]
        if reduce_min:
            a = jnp.where(vl, a, big)
            b = jnp.where(vr, b, big)
            return jnp.minimum(a, b)
        a = jnp.where(vl, a, -big)
        b = jnp.where(vr, b, -big)
        return jnp.maximum(a, b)

    min_tx = pick(eye["min_tx"], vis_l, vis_r, True)
    max_tx = pick(eye["max_tx"], vis_l, vis_r, False)
    min_ty = pick(eye["min_ty"], vis_l, vis_r, True)
    max_ty = pick(eye["max_ty"], vis_l, vis_r, False)
    px_min = pick(eye["px_min"], vis_l, vis_r, True)
    px_max = pick(eye["px_max"], vis_l, vis_r, False)
    py_min = pick(eye["py_min"], vis_l, vis_r, True)
    py_max = pick(eye["py_max"], vis_l, vis_r, False)
    rect_ok = (min_tx <= max_tx) & (min_ty <= max_ty)
    any_vis &= rect_ok
    rect_count = jnp.where(
        any_vis, (max_tx - min_tx + 1) * (max_ty - min_ty + 1), 0
    ).astype(jnp.int32)

    def eye_record(i, vis):
        # Invisible eye: mean pushed far off-screen so alpha underflows to zero
        # (the reference writes -1e10 — DepthFirstShaders.metal:459-483; that
        # overflows float16 to -inf and would NaN the linear-form constants, so
        # we REPLACE the mean with the largest finite offset: the invisible
        # eye's raw screen coordinate is itself unbounded (perspective divide
        # guards w at 1e-12), so adding an offset would still overflow f16.
        # q >= (6e4 / sigma_max)^2 > 2000 for any stabilized sigma, making
        # exp(-q/2) exactly 0.
        def safe_mean(coord):
            return jnp.where(vis, coord, -6e4).astype(jnp.float16)

        return RenderRecord(
            mean_x=safe_mean(eye["screen_x"][i]),
            mean_y=safe_mean(eye["screen_y"][i]),
            theta=M.pack_theta_u16(jnp.where(vis, eye["theta"][i], 0.0)),
            sigma1=jnp.where(vis, eye["sigma1"][i], 1.0).astype(jnp.float16),
            sigma2=jnp.where(vis, eye["sigma2"][i], 1.0).astype(jnp.float16),
            depth=jnp.where(vis, eye["depth"][i], 0.0).astype(jnp.float16),
            color=color_u8,
            opacity=op_u8,
        )

    depth_key = jnp.where(any_vis, M.float_to_sortable_uint(check_depth),
                          jnp.uint32(0xFFFFFFFF))
    return StereoProjectionResult(
        record_left=eye_record(0, vis_l),
        record_right=eye_record(1, vis_r),
        eye_visible=jnp.stack([vis_l, vis_r]),
        visible=any_vis,
        min_tx=jnp.where(any_vis, min_tx, 0),
        max_tx=jnp.where(any_vis, max_tx, -1),
        min_ty=jnp.where(any_vis, min_ty, 0),
        max_ty=jnp.where(any_vis, max_ty, -1),
        rect_count=rect_count,
        depth_key=depth_key,
        center_depth=check_depth.astype(jnp.float16),
        px_min=jnp.where(any_vis, px_min, 0.0).astype(jnp.float32),
        px_max=jnp.where(any_vis, px_max, 0.0).astype(jnp.float32),
        py_min=jnp.where(any_vis, py_min, 0.0).astype(jnp.float32),
        py_max=jnp.where(any_vis, py_max, 0.0).astype(jnp.float32),
    )
