"""Gaussian-splatting math library: the TPU-native equivalent of the reference's
shared MSL kernel library (Sources/Renderer/Shared/GaussianShared.h:1-852).

Every function here is a pure, batched ``jnp`` function over arrays of N gaussians
(the reference evaluates per-thread scalars; we evaluate whole vectors on the VPU).
Semantics are kept equal to the reference:

* SH basis constants and per-degree evaluation       (GaussianShared.h:13-116)
* sRGB decode                                        (GaussianShared.h:118-133)
* quaternion -> rotation, 3D covariance RSS^TR^T     (GaussianShared.h:289-324)
* Z-sign-agnostic 2D covariance projection with
  frustum-tangent clamp and 0.3px low-pass filter    (GaussianShared.h:326-388)
* covariance stabilization (min var, axis-ratio and
  screen-bound eigenvalue clamps)                    (GaussianShared.h:655-714)
* eigen-decomposition to (theta, sigma1, sigma2) and
  the u16 theta packing in [0, pi)                   (GaussianShared.h:434-488)
* conic reconstruction from (theta, sigma1, sigma2)  (GaussianShared.h:490-585)
* exact min-of-quadratic-over-rect tile test and the
  d^2 alpha cutoff                                   (GaussianShared.h:517-593)
* legacy ellipse-segment tile intersection           (GaussianShared.h:595-653)
* cull predicates (scale, radius, far plane, total
  ink, screen bounds)                                (GaussianShared.h:717-781)
* tile-bounds computation                            (GaussianShared.h:783-828)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# --- SH constants (GaussianShared.h:13-28) ---------------------------------------

SH_C0 = 0.28209479177387814
SH_C1 = 0.4886025119029199
SH_C2 = (1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
         -1.0925484305920792, 0.5462742152960396)
SH_C3 = (-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
         0.3731763325901154, -0.4570457994644658, 1.445305721320277,
         -0.5900435899266435)

PI = float(np.pi)

# Stabilization constants (GaussianShared.h:655-658).
COV_MIN_VAR = 1e-4
COV_MIN_DET = 1e-8
COV_MAX_AXIS_RATIO = 256.0
COV_BOUNDS_RADIUS = 3.0

# Cull constants (GaussianShared.h:717-729).
MIN_GAUSSIAN_SCALE = 0.0005
MIN_PROJECTED_RADIUS = 0.5


# --- Spherical harmonics ---------------------------------------------------------

def sh_basis_c(x, y, z, degree: int):
    """SH basis values for unit direction components up to ``degree`` (0..3).

    Returns a list of n_coeffs = (degree+1)^2 arrays (component SoA form —
    no (N, n_coeffs) stack; every term stays an (N,)-wide lane vector).
    Matches GaussianShared.h:55-80.
    """
    out = [jnp.full_like(x, SH_C0)]
    if degree >= 1:
        out += [-SH_C1 * y, SH_C1 * z, -SH_C1 * x]
    if degree >= 2:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        out += [
            SH_C2[0] * xy,
            SH_C2[1] * yz,
            SH_C2[2] * (2.0 * zz - xx - yy),
            SH_C2[3] * xz,
            SH_C2[4] * (xx - yy),
        ]
    if degree >= 3:
        xx, yy, zz = x * x, y * y, z * z
        xy = x * y
        out += [
            SH_C3[0] * y * (3.0 * xx - yy),
            SH_C3[1] * xy * z,
            SH_C3[2] * y * (4.0 * zz - xx - yy),
            SH_C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy),
            SH_C3[4] * x * (4.0 * zz - xx - yy),
            SH_C3[5] * z * (xx - yy),
            SH_C3[6] * x * (xx - 3.0 * yy),
        ]
    return out


def sh_basis(direction, degree: int):
    """SH basis for unit ``direction`` (..., 3) -> (..., n_coeffs) (wrapper)."""
    return jnp.stack(
        sh_basis_c(direction[..., 0], direction[..., 1], direction[..., 2],
                   degree), axis=-1)


def compute_sh_color(harmonics, positions, camera_center, degree: int):
    """Evaluate SH color for N gaussians ((N, 3) positions wrapper)."""
    return compute_sh_color_c(harmonics, positions[..., 0], positions[..., 1],
                              positions[..., 2], camera_center, degree)


def compute_sh_color_c(harmonics, px, py, pz, camera_center, degree: int):
    """Evaluate SH color for N gaussians (component form).

    ``harmonics``: channel-planar (3, n_coeffs, N) (GaussianInput storage
    layout; the reference's per-gaussian planar [R0..Rn, G0..Gn, B0..Bn] —
    GaussianShared.h:86-106 — transposed once at input construction so every op
    here runs on (N,)-wide lanes).
    ``px/py/pz``: (N,) world position components; ``camera_center``: (3,).
    Returns (N, 3) linear color (pre +0.5 offset).
    """
    hp = harmonics.astype(jnp.float32)  # (3, C, N)
    if degree == 0:
        # keep a (value-less) dependency on camera_center: programs whose
        # argument sets differ only by dropped unused args trip an XLA:CPU
        # executable-dispatch bug ("Execution supplied 8 buffers but compiled
        # program expected 9") on repeat dispatch.  XLA cannot fold 0*x for a
        # runtime float (NaN semantics), so this survives as a no-op use.
        keep_alive = 0.0 * jnp.sum(camera_center)
        return jnp.stack([hp[ch, 0] * SH_C0 + keep_alive for ch in range(3)],
                         axis=-1)
    dx = camera_center[0] - px
    dy = camera_center[1] - py
    dz = camera_center[2] - pz
    inv = jax.lax.rsqrt(jnp.maximum(dx * dx + dy * dy + dz * dz, 1e-24))
    n_coeffs = (degree + 1) ** 2
    basis = sh_basis_c(dx * inv, dy * inv, dz * inv, degree)  # list of (N,)
    out = []
    for ch in range(3):
        acc = hp[ch, 0] * basis[0]
        for c in range(1, n_coeffs):
            acc = acc + hp[ch, c] * basis[c]
        out.append(acc)
    return jnp.stack(out, axis=-1)


def srgb_to_linear(c):
    """Per-channel sRGB decode (GaussianShared.h:118-129)."""
    c = jnp.clip(c, 0.0, 1.0)
    return jnp.where(c <= 0.04045, c / 12.92, jnp.power((c + 0.055) / 1.055, 2.4))


# --- Projection ------------------------------------------------------------------

def ndc_to_screen(ndc, width, height):
    """Map NDC [-1, 1] to screen pixels [0, size] (GaussianShared.h:150-155)."""
    return jnp.stack(
        [(ndc[..., 0] + 1.0) * 0.5 * width, (ndc[..., 1] + 1.0) * 0.5 * height],
        axis=-1,
    )


def apply_mat4_c(m, x, y, z):
    """(4, 4) applied to homogeneous component vectors -> 4 component arrays.

    Explicit linear combinations so TPU matmul default (bf16) precision never
    applies — the projection feeds depth sort keys and must be exact float32.
    Component (SoA) form: every operand is an (N,)-wide lane vector (ops on
    (N, 3)/(N, 4) arrays use 3-4 of 128 lanes on the VPU)."""
    return tuple(m[i, 0] * x + m[i, 1] * y + m[i, 2] * z + m[i, 3]
                 for i in range(4))


def apply_mat4(m, positions):
    """(4, 4) x (N, 3 homogeneous) -> (N, 4) (array-shaped wrapper)."""
    out = apply_mat4_c(m, positions[..., 0], positions[..., 1],
                       positions[..., 2])
    return jnp.stack(out, axis=-1)


def project_points_c(px, py, pz, view, proj, near):
    """Component-form projection; Z-sign-agnostic (GaussianShared.h:199-234).

    Returns (vx, vy, vz, ndc_x, ndc_y, depth, in_front); ``depth`` is clip.w
    (positive in front for both conventions)."""
    vx, vy, vz, _vw = apply_mat4_c(view, px, py, pz)
    cx, cy, _cz, cw = apply_mat4_c(proj, vx, vy, vz)
    depth = cw
    in_front = depth > near
    safe_w = jnp.where(jnp.abs(depth) > 1e-12, depth, 1e-12)
    inv_w = 1.0 / safe_w
    return vx, vy, vz, cx * inv_w, cy * inv_w, depth, in_front


def project_points(positions, view, proj, near):
    """Project (N, 3) world points (array-shaped wrapper around
    :func:`project_points_c`)."""
    vx, vy, vz, nx, ny, depth, in_front = project_points_c(
        positions[..., 0], positions[..., 1], positions[..., 2],
        view, proj, near)
    return (jnp.stack([vx, vy, vz], -1), jnp.stack([nx, ny], -1), depth,
            in_front)


# --- Covariance ------------------------------------------------------------------

def normalize_quaternion(quat):
    """(N, 4) -> unit quaternions (GaussianShared.h:289-295); layout (x, y, z, w)."""
    norm = jnp.sqrt(jnp.maximum(jnp.sum(quat * quat, axis=-1, keepdims=True), 1e-8))
    return quat / norm


def quaternion_to_matrix(quat):
    """(N, 4) unit quaternions (x, y, z, r) -> (N, 3, 3) rotation matrices
    (GaussianShared.h:297-305)."""
    x, y, z, r = quat[..., 0], quat[..., 1], quat[..., 2], quat[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    row0 = jnp.stack([1 - 2 * (yy + zz), 2 * (xy - r * z), 2 * (xz + r * y)], -1)
    row1 = jnp.stack([2 * (xy + r * z), 1 - 2 * (xx + zz), 2 * (yz - r * x)], -1)
    row2 = jnp.stack([2 * (xz - r * y), 2 * (yz + r * x), 1 - 2 * (xx + yy)], -1)
    return jnp.stack([row0, row1, row2], axis=-2)


def build_covariance_3d_c(sx, sy, sz, qx, qy, qz, qw):
    """Component-form Sigma = R S S^T R^T (GaussianShared.h:289-324).

    Takes per-component (N,) scale / quaternion lane vectors; returns the six
    upper-triangle components (c00, c01, c02, c11, c12, c22).  Everything runs
    on (N,)-wide lanes — (N, 3, 3)-shaped intermediates put the matrix dims on
    the minor (lane) axes and waste 121/128 lanes per op.
    """
    inv_norm = jax.lax.rsqrt(
        jnp.maximum(qx * qx + qy * qy + qz * qz + qw * qw, 1e-8))
    x, y, z, r = qx * inv_norm, qy * inv_norm, qz * inv_norm, qw * inv_norm
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    # rotation rows scaled by the scale columns: rs[i][k] = R[i][k] * s[k]
    rs = [
        [(1 - 2 * (yy + zz)) * sx, 2 * (xy - r * z) * sy, 2 * (xz + r * y) * sz],
        [2 * (xy + r * z) * sx, (1 - 2 * (xx + zz)) * sy, 2 * (yz - r * x) * sz],
        [2 * (xz - r * y) * sx, 2 * (yz + r * x) * sy, (1 - 2 * (xx + yy)) * sz],
    ]

    def dot(i, j):
        return rs[i][0] * rs[j][0] + rs[i][1] * rs[j][1] + rs[i][2] * rs[j][2]

    return dot(0, 0), dot(0, 1), dot(0, 2), dot(1, 1), dot(1, 2), dot(2, 2)


def build_covariance_3d(scales, quats):
    """Sigma = R S S^T R^T for (N, 3) scales / (N, 4) quats -> (N, 3, 3)
    (array-shaped wrapper around :func:`build_covariance_3d_c`)."""
    c00, c01, c02, c11, c12, c22 = build_covariance_3d_c(
        scales[..., 0], scales[..., 1], scales[..., 2],
        quats[..., 0], quats[..., 1], quats[..., 2], quats[..., 3])
    rows = [jnp.stack([c00, c01, c02], -1),
            jnp.stack([c01, c11, c12], -1),
            jnp.stack([c02, c12, c22], -1)]
    return jnp.stack(rows, axis=-2)


def project_covariance_2d_c(c3d, vx, vy, vz, view_rot, proj, width, height):
    """Component-form Z-sign-agnostic EWA 2D covariance
    (GaussianShared.h:326-375).

    ``c3d``: 6-tuple of upper-triangle cov3d components (c00..c22);
    ``vx/vy/vz``: view-space position components; ``view_rot``: (3, 3)
    upper-left of the view matrix; ``proj``: (4, 4).
    Returns (a, b, d) 2D covariance components, 0.3px low-pass added.
    """
    s00, s01, s02, s11, s12, s22 = c3d
    z = vz
    abs_z = jnp.abs(z)
    sign_z = jnp.where(z >= 0.0, 1.0, -1.0)
    safe_abs_z = jnp.maximum(abs_z, 1e-4)
    inv_z = 1.0 / safe_abs_z
    inv_z2 = inv_z * inv_z

    tan_fov_x = 1.0 / jnp.maximum(jnp.abs(proj[0, 0]), 1e-4)
    tan_fov_y = 1.0 / jnp.maximum(jnp.abs(proj[1, 1]), 1e-4)
    lim_x = 1.3 * tan_fov_x
    lim_y = 1.3 * tan_fov_y

    x_cl = jnp.clip(vx * inv_z, -lim_x, lim_x) * safe_abs_z
    y_cl = jnp.clip(vy * inv_z, -lim_y, lim_y) * safe_abs_z

    focal_x = width * jnp.abs(proj[0, 0]) * 0.5
    focal_y = height * jnp.abs(proj[1, 1]) * 0.5

    # J rows (reference builds columns; identical matrix): row-major
    #   [fx/|z|, 0, -fx*x*signZ/|z|^2]
    #   [0, fy/|z|, -fy*y*signZ/|z|^2]
    j00 = focal_x * inv_z
    j11 = focal_y * inv_z
    j02 = -focal_x * x_cl * sign_z * inv_z2
    j12 = -focal_y * y_cl * sign_z * inv_z2
    # T = J @ view_rot: T[0, k] = j00 * R[0, k] + j02 * R[2, k]
    t0 = [j00 * view_rot[0, k] + j02 * view_rot[2, k] for k in range(3)]
    t1 = [j11 * view_rot[1, k] + j12 * view_rot[2, k] for k in range(3)]

    # M = T @ cov3d (rows of T against the symmetric cov3d), then
    # cov2d = M @ T^T — all elementwise (batched tiny einsums are pathological
    # on TPU).
    sym = [[s00, s01, s02], [s01, s11, s12], [s02, s12, s22]]

    def m_row(t):
        return [t[0] * sym[0][k] + t[1] * sym[1][k] + t[2] * sym[2][k]
                for k in range(3)]

    m0 = m_row(t0)
    m1 = m_row(t1)
    a = m0[0] * t0[0] + m0[1] * t0[1] + m0[2] * t0[2] + 0.3
    b = m0[0] * t1[0] + m0[1] * t1[1] + m0[2] * t1[2]
    d = m1[0] * t1[0] + m1[1] * t1[1] + m1[2] * t1[2] + 0.3
    return a, b, d


def project_covariance_2d(cov3d, view_pos, view_rot, proj, width, height):
    """Array-shaped wrapper: (N, 3, 3) cov3d + (N, 3) view_pos -> (N, 2, 2)."""
    c3d = (cov3d[..., 0, 0], cov3d[..., 0, 1], cov3d[..., 0, 2],
           cov3d[..., 1, 1], cov3d[..., 1, 2], cov3d[..., 2, 2])
    a, b, d = project_covariance_2d_c(
        c3d, view_pos[..., 0], view_pos[..., 1], view_pos[..., 2],
        view_rot, proj, width, height)
    return jnp.stack([jnp.stack([a, b], -1), jnp.stack([b, d], -1)], axis=-2)


def _sym_eigen_2x2(a, b, d, min_lambda2):
    """Eigen-decomposition of symmetric [[a, b], [b, d]]; returns
    (lambda1, lambda2, v1x, v1y) with lambda1 >= lambda2 and lambda2 floored."""
    det = a * d - b * b
    mid = 0.5 * (a + d)
    disc = jnp.maximum(mid * mid - det, 0.0)
    sqrt_disc = jnp.sqrt(disc)
    lam1 = mid + sqrt_disc
    lam2 = jnp.maximum(mid - sqrt_disc, min_lambda2)
    use_b = jnp.abs(b) > 1e-8
    vx = jnp.where(use_b, b, jnp.where(a >= d, 1.0, 0.0))
    vy = jnp.where(use_b, lam1 - a, jnp.where(a >= d, 0.0, 1.0))
    vlen = jnp.sqrt(vx * vx + vy * vy)
    inv = 1.0 / jnp.maximum(vlen, 1e-8)
    return lam1, lam2, vx * inv, vy * inv


def stabilize_covariance_2d_c(a, b, d, width, height):
    """Component-form covariance stabilization (GaussianShared.h:660-714):
    variance floors, det repair, screen-bound eigenvalue clamp and 256x
    axis-ratio cap.  Returns (a, b, d)."""
    max_cond = COV_MAX_AXIS_RATIO * COV_MAX_AXIS_RATIO
    max_dim = jnp.maximum(jnp.asarray(width, jnp.float32), jnp.asarray(height, jnp.float32))
    max_extent_px = max_dim * 2.0
    max_eig = (max_extent_px / COV_BOUNDS_RADIUS) ** 2

    finite = jnp.isfinite(a) & jnp.isfinite(b) & jnp.isfinite(d)
    a = jnp.where(finite, a, 1.0)
    b = jnp.where(finite, b, 0.0)
    d = jnp.where(finite, d, 1.0)

    a = jnp.maximum(a, COV_MIN_VAR)
    d = jnp.maximum(d, COV_MIN_VAR)
    det = a * d - b * b
    det_finite = jnp.isfinite(det)
    det = jnp.where(det_finite, det, 0.0)
    need_bump = det < COV_MIN_DET
    bump = jnp.where(need_bump, (COV_MIN_DET - det) + COV_MIN_VAR, 0.0)
    a = a + bump
    d = d + bump

    lam1, lam2, v1x, v1y = _sym_eigen_2x2(a, b, d, COV_MIN_VAR)
    v2x, v2y = v1y, -v1x
    lam1 = jnp.minimum(lam1, max_eig)
    lam2 = jnp.maximum(lam2, lam1 / max_cond)

    out_a = lam1 * v1x * v1x + lam2 * v2x * v2x
    out_b = lam1 * v1x * v1y + lam2 * v2x * v2y
    out_d = lam1 * v1y * v1y + lam2 * v2y * v2y
    one = jnp.ones_like(out_a)
    zero = jnp.zeros_like(out_a)
    return (jnp.where(finite, out_a, one), jnp.where(finite, out_b, zero),
            jnp.where(finite, out_d, one))


def stabilize_covariance_2d(cov2d, width, height):
    """Array-shaped wrapper: (N, 2, 2) -> (N, 2, 2)."""
    a, b, d = stabilize_covariance_2d_c(
        cov2d[..., 0, 0], 0.5 * (cov2d[..., 0, 1] + cov2d[..., 1, 0]),
        cov2d[..., 1, 1], width, height)
    return jnp.stack([jnp.stack([a, b], -1), jnp.stack([b, d], -1)], axis=-2)


def covariance_to_theta_sigmas_c(a, b, d):
    """Component form of :func:`covariance_to_theta_sigmas`
    (GaussianShared.h:446-488)."""
    a = jnp.maximum(a, 1e-8)
    d = jnp.maximum(d, 1e-8)
    finite = jnp.isfinite(a) & jnp.isfinite(b) & jnp.isfinite(d)
    det = a * d - b * b
    ok = finite & jnp.isfinite(det) & (det > 0.0)

    mid = 0.5 * (a + d)
    disc = jnp.maximum(mid * mid - det, 0.0)
    sqrt_disc = jnp.sqrt(disc)
    lam1 = jnp.maximum(mid + sqrt_disc, 1e-8)
    lam2 = jnp.maximum(mid - sqrt_disc, 1e-8)

    use_b = jnp.abs(b) > 1e-8
    vx = jnp.where(use_b, b, jnp.where(a >= d, 1.0, 0.0))
    vy = jnp.where(use_b, lam1 - a, jnp.where(a >= d, 0.0, 1.0))
    vlen = jnp.sqrt(vx * vx + vy * vy)
    vx = vx / jnp.maximum(vlen, 1e-12)
    vy = vy / jnp.maximum(vlen, 1e-12)

    theta = jnp.arctan2(vy, vx)
    theta = jnp.mod(theta, PI)
    theta = jnp.where(theta >= PI, theta - PI, theta)

    sigma1 = jnp.sqrt(lam1)
    sigma2 = jnp.sqrt(lam2)
    ok = ok & jnp.isfinite(theta) & jnp.isfinite(sigma1) & jnp.isfinite(sigma2)
    return theta, sigma1, sigma2, ok


def covariance_to_theta_sigmas(cov2d):
    """(N, 2, 2) -> (theta in [0, pi), sigma1, sigma2, ok)
    (array-shaped wrapper around :func:`covariance_to_theta_sigmas_c`)."""
    return covariance_to_theta_sigmas_c(
        cov2d[..., 0, 0], 0.5 * (cov2d[..., 0, 1] + cov2d[..., 1, 0]),
        cov2d[..., 1, 1])


def pack_theta_u16(theta):
    """theta [0, pi) -> u16 (GaussianShared.h:434-440)."""
    t = jnp.mod(theta, PI)
    t = jnp.where(t < 0.0, t + PI, t)
    u = t * (65535.0 / PI)
    return jnp.clip(u + 0.5, 0.0, 65535.0).astype(jnp.uint16)


def unpack_theta_u16(packed):
    """u16 -> theta (GaussianShared.h:442-444)."""
    return packed.astype(jnp.float32) * (PI / 65535.0)


def conic_from_theta_sigmas(theta, sigma1, sigma2, min_sigma: float = 1e-4):
    """(theta, s1, s2) -> conic (A, B, C) with q = A dx^2 + 2B dx dy + C dy^2
    (GaussianShared.h:490-510; the twin at :569-585 floors sigma^2 at 1e-12 —
    we follow the :490 variant used by the render path, flooring sigma at 1e-4)."""
    c = jnp.cos(theta)
    s = jnp.sin(theta)
    s1 = jnp.maximum(sigma1, min_sigma)
    s2 = jnp.maximum(sigma2, min_sigma)
    iv1 = 1.0 / (s1 * s1)
    iv2 = 1.0 / (s2 * s2)
    cc, ss, cs = c * c, s * s, c * s
    A = cc * iv1 + ss * iv2
    B = cs * (iv1 - iv2)
    C = ss * iv1 + cc * iv2
    return A, B, C


def compute_obb_extents_c(a, b, d, sigma_multiplier=3.0):
    """Component form of :func:`compute_obb_extents`
    (GaussianShared.h:402-427); returns (x_extent, y_extent)."""
    det = a * d - b * b
    mid = 0.5 * (a + d)
    disc = jnp.maximum(mid * mid - det, 1e-6)
    sqrt_disc = jnp.sqrt(disc)
    lam1 = mid + sqrt_disc
    lam2 = jnp.maximum(mid - sqrt_disc, 1e-6)
    e1 = sigma_multiplier * jnp.sqrt(jnp.maximum(lam1, 1e-6))
    e2 = sigma_multiplier * jnp.sqrt(jnp.maximum(lam2, 1e-6))
    use_b = jnp.abs(b) > 1e-6
    vx = jnp.where(use_b, b, jnp.where(a >= d, 1.0, 0.0))
    vy = jnp.where(use_b, lam1 - a, jnp.where(a >= d, 0.0, 1.0))
    vlen = jnp.maximum(jnp.sqrt(vx * vx + vy * vy), 1e-6)
    vx, vy = vx / vlen, vy / vlen
    x_extent = jnp.abs(vx) * e1 + jnp.abs(vy) * e2
    y_extent = jnp.abs(vy) * e1 + jnp.abs(vx) * e2
    return x_extent, y_extent


def compute_obb_extents(cov2d, sigma_multiplier=3.0):
    """Axis-aligned extents of the oriented sigma_multiplier-sigma box
    (GaussianShared.h:402-427); array-shaped wrapper."""
    ex, ey = compute_obb_extents_c(cov2d[..., 0, 0], cov2d[..., 0, 1],
                                   cov2d[..., 1, 1], sigma_multiplier)
    return jnp.stack([ex, ey], axis=-1)


def compute_conic_and_radius(cov2d):
    """Inverse conic + conservative radius (GaussianShared.h:390-400)."""
    a = cov2d[..., 0, 0]
    b = cov2d[..., 0, 1]
    c = cov2d[..., 1, 0]
    d = cov2d[..., 1, 1]
    det = a * d - b * c
    inv_det = 1.0 / jnp.maximum(det, 1e-8)
    conic = jnp.stack([d * inv_det, -b * inv_det, a * inv_det], axis=-1)
    mid = 0.5 * (a + d)
    delta = jnp.maximum(mid * mid - det, 1e-5)
    max_eig = mid + jnp.sqrt(delta)
    radius = 3.0 * jnp.ceil(jnp.sqrt(jnp.maximum(max_eig, 1e-5)))
    return conic, radius


# --- Tile tests ------------------------------------------------------------------

def eval_quad(x, y, a, b, c):
    """q(x, y) = a x^2 + 2 b x y + c y^2 (GaussianShared.h:518-520)."""
    return a * x * x + 2.0 * b * x * y + c * y * y


def min_quad_rect(xmin, xmax, ymin, ymax, a, b, c):
    """Exact minimum of the conic quadratic over an axis-aligned rect relative to
    the mean (GaussianShared.h:525-564).  Fully broadcastable."""
    inside = (xmin <= 0.0) & (0.0 <= xmax) & (ymin <= 0.0) & (0.0 <= ymax)
    inv_a = 1.0 / jnp.maximum(a, 1e-20)
    inv_c = 1.0 / jnp.maximum(c, 1e-20)

    y1 = jnp.clip(-(b * inv_c) * xmin, ymin, ymax)
    q1 = eval_quad(xmin, y1, a, b, c)
    y2 = jnp.clip(-(b * inv_c) * xmax, ymin, ymax)
    q2 = eval_quad(xmax, y2, a, b, c)
    x3 = jnp.clip(-(b * inv_a) * ymin, xmin, xmax)
    q3 = eval_quad(x3, ymin, a, b, c)
    x4 = jnp.clip(-(b * inv_a) * ymax, xmin, xmax)
    q4 = eval_quad(x4, ymax, a, b, c)

    qmin = jnp.minimum(jnp.minimum(q1, q2), jnp.minimum(q3, q4))
    return jnp.where(inside, 0.0, qmin)


def compute_d2_cutoff(opacity, tau):
    """Alpha cutoff in squared-Mahalanobis units; negative if opacity < tau
    (GaussianShared.h:590-593)."""
    return jnp.where(opacity < tau, -1.0, -2.0 * jnp.log(tau / jnp.maximum(opacity, 1e-30)))


def gaussian_compute_power(opacity):
    """ln2*8 + ln2*log2(opacity) (GaussianShared.h:595-597)."""
    ln2 = 0.693147180559945
    return ln2 * 8.0 + ln2 * jnp.log2(jnp.maximum(opacity, 1e-6))


def _segment_intersect_ellipse(a, b, c, d, lo, hi):
    """Quadratic-segment test helper (GaussianShared.h:599-604)."""
    delta = b * b - 4.0 * a * c
    t1 = (lo - d) * (2.0 * a) + b
    t2 = (hi - d) * (2.0 * a) + b
    return (delta >= 0.0) & ((t1 <= 0.0) | (t1 * t1 <= delta)) & ((t2 >= 0.0) | (t2 * t2 <= delta))


def gaussian_intersects_tile(pix_min_x, pix_min_y, pix_max_x, pix_max_y,
                             center_x, center_y, conic_a, conic_b, conic_c, power):
    """FlashGS-style exact ellipse vs tile test (GaussianShared.h:606-645).

    ``conic_*`` here is the *inverse covariance* triple (a, b, c); ``power`` from
    :func:`gaussian_compute_power`.  All args broadcastable.
    """
    contains = (
        (center_x >= pix_min_x) & (center_x <= pix_max_x)
        & (center_y >= pix_min_y) & (center_y <= pix_max_y)
    )
    w = 2.0 * power
    dx = jnp.where(center_x * 2.0 < pix_min_x + pix_max_x,
                   center_x - pix_min_x, center_x - pix_max_x)
    hit_v = _segment_intersect_ellipse(
        conic_c, -2.0 * conic_b * dx, conic_a * dx * dx - w,
        center_y, pix_min_y, pix_max_y)
    dy = jnp.where(center_y * 2.0 < pix_min_y + pix_max_y,
                   center_y - pix_min_y, center_y - pix_max_y)
    hit_h = _segment_intersect_ellipse(
        conic_a, -2.0 * conic_b * dy, conic_c * dy * dy - w,
        center_x, pix_min_x, pix_max_x)
    return contains | hit_v | hit_h


# --- Culling ---------------------------------------------------------------------

def cull_by_scale_c(sx, sy, sz):
    """Component form: max scale < 5e-4 (GaussianShared.h:719-722)."""
    return jnp.maximum(jnp.maximum(sx, sy), sz) < MIN_GAUSSIAN_SCALE


def cull_by_scale(scales):
    """max scale < 5e-4 (GaussianShared.h:719-722)."""
    return cull_by_scale_c(scales[..., 0], scales[..., 1], scales[..., 2])


def cull_by_radius(radius):
    return radius < MIN_PROJECTED_RADIUS


def cull_by_far_plane(depth, far_plane):
    return depth > far_plane


def compute_depth_factor(depth, near_plane, far_plane):
    """LOD depth factor (GaussianShared.h:275-278)."""
    adjusted_far = far_plane * 0.02
    t = jnp.clip((adjusted_far - depth) / (adjusted_far - near_plane), 0.0, 1.0)
    return 1.0 - t * t


def cull_by_total_ink(opacity, det_cov2d, depth, near_plane, far_plane, threshold):
    """Total-ink cull with depth-adaptive threshold (GaussianShared.h:739-752)."""
    if threshold <= 0.0:
        return jnp.zeros_like(depth, dtype=bool)
    total_ink = opacity * 6.283185 * jnp.sqrt(jnp.maximum(det_cov2d, 1e-12))
    return total_ink < compute_depth_factor(depth, near_plane, far_plane) * threshold


def cull_by_screen_bounds_c(sx, sy, ex, ey, width, height):
    """Component form of the off-screen cull (GaussianShared.h:771-781)."""
    return ((sx + ex < 0.0) | (sx - ex > width)
            | (sy + ey < 0.0) | (sy - ey > height))


def cull_by_screen_bounds(screen, obb_extents, width, height):
    """Off-screen cull using OBB extents (GaussianShared.h:771-781)."""
    return cull_by_screen_bounds_c(screen[..., 0], screen[..., 1],
                                   obb_extents[..., 0], obb_extents[..., 1],
                                   width, height)


def compute_tile_bounds_c(sx, sy, ex, ey, width, height, tile_w, tile_h,
                          tiles_x, tiles_y):
    """Component form of the clamped inclusive tile rect
    (GaussianShared.h:791-828).  Returns int32 (min_tx, max_tx, min_ty,
    max_ty); invalid when min > max."""
    xmin = jnp.clip(sx - ex, 0.0, width - 1.0)
    xmax = jnp.clip(sx + ex, 0.0, width - 1.0)
    ymin = jnp.clip(sy - ey, 0.0, height - 1.0)
    ymax = jnp.clip(sy + ey, 0.0, height - 1.0)

    min_tx = jnp.maximum(jnp.floor(xmin / tile_w).astype(jnp.int32), 0)
    max_tx = jnp.minimum(jnp.ceil(xmax / tile_w).astype(jnp.int32) - 1, tiles_x - 1)
    min_ty = jnp.maximum(jnp.floor(ymin / tile_h).astype(jnp.int32), 0)
    max_ty = jnp.minimum(jnp.ceil(ymax / tile_h).astype(jnp.int32) - 1, tiles_y - 1)
    return min_tx, max_tx, min_ty, max_ty


def compute_tile_bounds(screen, obb_extents, width, height, tile_w, tile_h,
                        tiles_x, tiles_y):
    """Clamped inclusive tile rect (array-shaped wrapper)."""
    return compute_tile_bounds_c(screen[..., 0], screen[..., 1],
                                 obb_extents[..., 0], obb_extents[..., 1],
                                 width, height, tile_w, tile_h,
                                 tiles_x, tiles_y)


# --- Sortable depth keys ---------------------------------------------------------

def float_to_sortable_uint(v):
    """IEEE float -> order-preserving uint32 (DepthFirstShaders.metal:33-37)."""
    bits = jnp.asarray(v, jnp.float32).view(jnp.uint32)
    mask = jnp.where(bits & jnp.uint32(0x80000000),
                     jnp.uint32(0xFFFFFFFF), jnp.uint32(0x80000000))
    return bits ^ mask


def sortable_uint_to_float(u):
    """Inverse mapping (DepthFirstShaders.metal:39-43)."""
    u = jnp.asarray(u, jnp.uint32)
    bits = jnp.where(u & jnp.uint32(0x80000000), u ^ jnp.uint32(0x80000000), ~u)
    return bits.view(jnp.float32)


def half_depth_key16(depth):
    """Depth -> 16-bit sortable key: float16 bits ^ 0x8000
    (reference: GlobalShaders.metal:266-300 packs [tile:16 | halfBits^0x8000:16]).

    Order-preserving for non-negative depths; visible depths are always > near > 0.
    Negative halves additionally get their order reversed so the mapping is fully
    monotonic over all finite values.
    """
    h = jnp.asarray(depth, jnp.float16).view(jnp.uint16).astype(jnp.uint32)
    sign = h & jnp.uint32(0x8000)
    return jnp.where(sign != 0, (~h) & jnp.uint32(0xFFFF), h ^ jnp.uint32(0x8000))
