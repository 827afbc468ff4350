"""Independent NumPy reference renderer for golden tests.

Implements the reference Metal semantics (project -> cull -> quantize -> exact
per-tile lists -> depth-ordered front-to-back blend) scalar-by-scalar in NumPy,
deliberately *not* sharing code with gsm_renderer_tpu.mathlib so that tests
cross-check two implementations.  Blending is float32 (the Metal reference blends
in half; bit-parity with Metal hardware is out of scope — ordering and list
membership are exact, color tolerance ~1e-3).
"""

from __future__ import annotations

import math

import numpy as np

SH_C0 = 0.28209479177387814
SH_C1 = 0.4886025119029199
SH_C2 = (1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
         -1.0925484305920792, 0.5462742152960396)
SH_C3 = (-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
         0.3731763325901154, -0.4570457994644658, 1.445305721320277,
         -0.5900435899266435)


def sh_color(harm, pos, cam_center, degree):
    if degree == 0:
        return harm[0] * SH_C0
    d = cam_center - pos
    d = d / max(np.linalg.norm(d), 1e-12)
    x, y, z = d
    basis = [SH_C0]
    if degree >= 1:
        basis += [-SH_C1 * y, SH_C1 * z, -SH_C1 * x]
    if degree >= 2:
        xx, yy, zz = x * x, y * y, z * z
        basis += [SH_C2[0] * x * y, SH_C2[1] * y * z,
                  SH_C2[2] * (2 * zz - xx - yy), SH_C2[3] * x * z,
                  SH_C2[4] * (xx - yy)]
    if degree >= 3:
        xx, yy, zz = x * x, y * y, z * z
        basis += [SH_C3[0] * y * (3 * xx - yy), SH_C3[1] * x * y * z,
                  SH_C3[2] * y * (4 * zz - xx - yy),
                  SH_C3[3] * z * (2 * zz - 3 * xx - 3 * yy),
                  SH_C3[4] * x * (4 * zz - xx - yy), SH_C3[5] * z * (xx - yy),
                  SH_C3[6] * x * (xx - 3 * yy)]
    basis = np.asarray(basis, np.float32)
    return basis @ harm[: len(basis)]


def quat_to_rot(q):
    x, y, z, r = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y)],
        [2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x)],
        [2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y)],
    ], np.float32)


def min_quad_rect(xmin, xmax, ymin, ymax, a, b, c):
    if xmin <= 0.0 <= xmax and ymin <= 0.0 <= ymax:
        return 0.0
    inv_a = 1.0 / max(a, 1e-20)
    inv_c = 1.0 / max(c, 1e-20)
    qmin = np.inf
    for x in (xmin, xmax):
        y = np.clip(-(b * inv_c) * x, ymin, ymax)
        qmin = min(qmin, a * x * x + 2 * b * x * y + c * y * y)
    for y in (ymin, ymax):
        x = np.clip(-(b * inv_a) * y, xmin, xmax)
        qmin = min(qmin, a * x * x + 2 * b * x * y + c * y * y)
    return qmin


def render_reference(ds, view, proj, cam_center, width, height, *, sh_degree=0,
                     tile_w=16, tile_h=16, alpha_threshold=0.005,
                     total_ink_threshold=2.0, near=0.1, far=10.0,
                     input_is_srgb=False, exact_tile_test=True,
                     hardware_mode=False):
    """Returns (color (H, W, 4), depth (H, W), aux dict).

    ``hardware_mode``: skip the exact per-tile ellipse test and apply the r^2 <= 9
    fragment cutoff instead (HardwareRenderer semantics).
    """
    n = ds.count
    tiles_x = -(-width // tile_w)
    tiles_y = -(-height // tile_h)

    view = np.asarray(view, np.float32)
    proj = np.asarray(proj, np.float32)

    records = []  # per visible gaussian: dict
    for i in range(n):
        scale = ds.scales[i].astype(np.float32)
        if scale.max() < 5e-4:
            continue
        p = np.append(ds.positions[i], 1.0).astype(np.float32)
        vp = view @ p
        clip = proj @ vp
        depth = clip[3]
        if depth <= near or depth > far:
            continue
        opacity = float(ds.opacities[i])
        if opacity < alpha_threshold:
            continue
        ndc = clip[:2] / clip[3]
        sx = (ndc[0] + 1) * 0.5 * width
        sy = (ndc[1] + 1) * 0.5 * height

        q = ds.rotations[i].astype(np.float32)
        q = q / max(np.sqrt(max((q * q).sum(), 1e-8)), 1e-8)
        R = quat_to_rot(q)
        RS = R * scale[None, :]
        cov3d = RS @ RS.T

        z = vp[2]
        abs_z = max(abs(z), 1e-4)
        sign_z = 1.0 if z >= 0 else -1.0
        inv_z = 1.0 / abs_z
        tanx = 1.0 / max(abs(proj[0, 0]), 1e-4)
        tany = 1.0 / max(abs(proj[1, 1]), 1e-4)
        xcl = np.clip(vp[0] * inv_z, -1.3 * tanx, 1.3 * tanx) * abs_z
        ycl = np.clip(vp[1] * inv_z, -1.3 * tany, 1.3 * tany) * abs_z
        fx = width * abs(proj[0, 0]) * 0.5
        fy = height * abs(proj[1, 1]) * 0.5
        J = np.array([[fx * inv_z, 0, -fx * xcl * sign_z * inv_z ** 2],
                      [0, fy * inv_z, -fy * ycl * sign_z * inv_z ** 2]], np.float32)
        T = J @ view[:3, :3]
        cov2d = T @ cov3d @ T.T + np.diag([0.3, 0.3]).astype(np.float32)

        # stabilize
        a, b, d = cov2d[0, 0], 0.5 * (cov2d[0, 1] + cov2d[1, 0]), cov2d[1, 1]
        a = max(a, 1e-4)
        d = max(d, 1e-4)
        det = a * d - b * b
        if det < 1e-8:
            bump = (1e-8 - det) + 1e-4
            a, d = a + bump, d + bump
            det = a * d - b * b
        mid = 0.5 * (a + d)
        disc = max(mid * mid - det, 0.0)
        sq = math.sqrt(disc)
        lam1, lam2 = mid + sq, max(mid - sq, 1e-4)
        if abs(b) > 1e-8:
            v1 = np.array([b, lam1 - a])
            v1 = v1 / max(np.linalg.norm(v1), 1e-8)
        else:
            v1 = np.array([1.0, 0.0]) if a >= d else np.array([0.0, 1.0])
        v2 = np.array([v1[1], -v1[0]])
        max_dim = max(width, height)
        max_eig = (max_dim * 2.0 / 3.0) ** 2
        lam1 = min(lam1, max_eig)
        lam2 = max(lam2, lam1 / 256.0 ** 2)
        cov2d = lam1 * np.outer(v1, v1) + lam2 * np.outer(v2, v2)

        # theta/sigma
        a, b, d = max(cov2d[0, 0], 1e-8), 0.5 * (cov2d[0, 1] + cov2d[1, 0]), max(cov2d[1, 1], 1e-8)
        det = a * d - b * b
        if det <= 0:
            continue
        mid = 0.5 * (a + d)
        sq = math.sqrt(max(mid * mid - det, 0.0))
        lam1, lam2 = max(mid + sq, 1e-8), max(mid - sq, 1e-8)
        if abs(b) > 1e-8:
            v1 = np.array([b, lam1 - a])
            v1 = v1 / np.linalg.norm(v1)
        else:
            v1 = np.array([1.0, 0.0]) if a >= d else np.array([0.0, 1.0])
        theta = math.atan2(v1[1], v1[0]) % math.pi
        sigma1, sigma2 = math.sqrt(lam1), math.sqrt(lam2)

        radius = 3.0 * max(sigma1, sigma2)
        if radius < 0.5:
            continue
        # total ink
        if total_ink_threshold > 0:
            ink = opacity * 6.283185 * math.sqrt(max(det, 1e-12))
            afar = far * 0.02
            t = np.clip((afar - depth) / (afar - near), 0, 1)
            if ink < (1 - t * t) * total_ink_threshold:
                continue

        # obb extents
        det_o = a * d - b * b
        mid_o = 0.5 * (a + d)
        sq_o = math.sqrt(max(mid_o * mid_o - det_o, 1e-6))
        l1o, l2o = mid_o + sq_o, max(mid_o - sq_o, 1e-6)
        e1 = 3.0 * math.sqrt(max(l1o, 1e-6))
        e2 = 3.0 * math.sqrt(max(l2o, 1e-6))
        if abs(b) > 1e-6:
            v1o = np.array([b, l1o - a])
            v1o = v1o / max(np.linalg.norm(v1o), 1e-6)
        else:
            v1o = np.array([1.0, 0.0]) if a >= d else np.array([0.0, 1.0])
        ex = abs(v1o[0]) * e1 + abs(v1o[1]) * e2
        ey = abs(v1o[1]) * e1 + abs(v1o[0]) * e2
        if sx + ex < 0 or sx - ex > width or sy + ey < 0 or sy - ey > height:
            continue

        color = sh_color(ds.harmonics[i].astype(np.float32), ds.positions[i],
                         np.asarray(cam_center, np.float32), sh_degree)
        color = np.maximum(color + 0.5, 0.0)
        if input_is_srgb:
            color = np.where(color <= 0.04045, color / 12.92,
                             ((np.clip(color, 0, 1) + 0.055) / 1.055) ** 2.4)

        # quantize (GaussianRenderData)
        mean_q = np.float16([sx, sy]).astype(np.float32)
        theta_q = (int(np.clip(theta * (65535.0 / math.pi) + 0.5, 0, 65535))
                   * (math.pi / 65535.0))
        s1_q = float(np.float16(sigma1))
        s2_q = float(np.float16(sigma2))
        depth_q = float(np.float16(depth))
        col_q = np.clip(color * 255.0, 0, 255).astype(np.uint8).astype(np.float32) / 255.0
        op_q = float(np.clip(opacity * 255.0, 0, 255).astype(np.uint8)) / 255.0

        # tile rect
        xmin = np.clip(sx - ex, 0, width - 1)
        xmax = np.clip(sx + ex, 0, width - 1)
        ymin = np.clip(sy - ey, 0, height - 1)
        ymax = np.clip(sy + ey, 0, height - 1)
        min_tx = max(int(np.floor(xmin / tile_w)), 0)
        max_tx = min(int(np.ceil(xmax / tile_w)) - 1, tiles_x - 1)
        min_ty = max(int(np.floor(ymin / tile_h)), 0)
        max_ty = min(int(np.ceil(ymax / tile_h)) - 1, tiles_y - 1)
        if min_tx > max_tx or min_ty > max_ty:
            continue

        tau = max(alpha_threshold, 1e-12)
        if op_q < tau:
            continue
        d2cut = -2.0 * math.log(tau / op_q)

        c_, s_ = math.cos(theta_q), math.sin(theta_q)
        iv1 = 1.0 / max(s1_q, 1e-4) ** 2
        iv2 = 1.0 / max(s2_q, 1e-4) ** 2
        ca = c_ * c_ * iv1 + s_ * s_ * iv2
        cb = c_ * s_ * (iv1 - iv2)
        cc = s_ * s_ * iv1 + c_ * c_ * iv2

        tiles = []
        for ty in range(min_ty, max_ty + 1):
            for tx in range(min_tx, max_tx + 1):
                if exact_tile_test and not hardware_mode:
                    d2 = min_quad_rect(tx * tile_w - mean_q[0],
                                       tx * tile_w + tile_w - mean_q[0],
                                       ty * tile_h - mean_q[1],
                                       ty * tile_h + tile_h - mean_q[1],
                                       ca, cb, cc)
                    if d2 > d2cut:
                        continue
                tiles.append(ty * tiles_x + tx)
        if not tiles:
            continue
        records.append(dict(mean=mean_q, conic=(ca, cb, cc), color=col_q,
                            op=op_q, depth=depth, depth_q=depth_q, tiles=tiles,
                            index=i))

    # depth-first ordering: sort records by depth (sortable-uint trick == plain
    # ascending for positive floats), stable by index
    records.sort(key=lambda r: (np.float32(r["depth"]).view(np.uint32), r["index"]))

    color_img = np.zeros((height, width, 4), np.float32)
    depth_img = np.zeros((height, width), np.float32)

    tile_lists = {}
    for rank, rec in enumerate(records):
        for t in rec["tiles"]:
            tile_lists.setdefault(t, []).append(rank)

    for t, lst in tile_lists.items():
        ty, tx = divmod(t, tiles_x)
        for py in range(tile_h):
            yy = ty * tile_h + py
            if yy >= height:
                continue
            for px in range(tile_w):
                xx = tx * tile_w + px
                if xx >= width:
                    continue
                trans = 1.0
                col = np.zeros(3, np.float32)
                dep = 0.0
                for rank in lst:
                    if trans < 1.0 / 255.0:
                        break
                    rec = records[rank]
                    dx = xx - rec["mean"][0]
                    dy = yy - rec["mean"][1]
                    ca, cb, cc = rec["conic"]
                    qv = ca * dx * dx + 2 * cb * dx * dy + cc * dy * dy
                    if hardware_mode and qv > 9.0:
                        continue
                    alpha = min(rec["op"] * math.exp(-0.5 * qv), 0.99)
                    col += rec["color"] * (alpha * trans)
                    dep += rec["depth_q"] * (alpha * trans)
                    trans *= 1.0 - alpha
                color_img[yy, xx, :3] = col
                color_img[yy, xx, 3] = 1.0 - trans
                depth_img[yy, xx] = dep

    aux = dict(visible=len(records),
               total_instances=sum(len(r["tiles"]) for r in records),
               tile_lists=tile_lists, records=records)
    return color_img, depth_img, aux
