"""Unit tests for the math library vs independent NumPy references."""

import numpy as np
import jax.numpy as jnp
import pytest

from gsm_renderer_tpu import mathlib as M


def test_quaternion_to_matrix_identity():
    q = jnp.array([[0.0, 0.0, 0.0, 1.0]])
    R = np.asarray(M.quaternion_to_matrix(q))[0]
    np.testing.assert_allclose(R, np.eye(3), atol=1e-6)


def test_quaternion_to_matrix_rotation(rng):
    # 90-degree rotation around z: q = (0, 0, sin45, cos45)
    s = np.sin(np.pi / 4)
    q = jnp.array([[0.0, 0.0, s, s]])
    R = np.asarray(M.quaternion_to_matrix(q))[0]
    v = R @ np.array([1.0, 0.0, 0.0])
    np.testing.assert_allclose(v, [0.0, 1.0, 0.0], atol=1e-6)


def test_build_covariance_3d_is_spd(rng):
    n = 64
    scales = jnp.asarray(rng.uniform(0.01, 1.0, (n, 3)), jnp.float32)
    quats = jnp.asarray(rng.normal(size=(n, 4)), jnp.float32)
    cov = np.asarray(M.build_covariance_3d(scales, quats))
    np.testing.assert_allclose(cov, np.swapaxes(cov, -1, -2), atol=1e-5)
    eig = np.linalg.eigvalsh(cov)
    assert (eig > -1e-6).all()


def test_covariance_eigen_roundtrip(rng):
    n = 128
    # random SPD 2x2 matrices
    a = rng.uniform(0.5, 10, n)
    d = rng.uniform(0.5, 10, n)
    b = rng.uniform(-1, 1, n) * np.sqrt(a * d) * 0.8
    cov = np.stack([np.stack([a, b], -1), np.stack([b, d], -1)], -2).astype(np.float32)
    theta, s1, s2, ok = M.covariance_to_theta_sigmas(jnp.asarray(cov))
    theta, s1, s2 = map(np.asarray, (theta, s1, s2))
    assert np.asarray(ok).all()
    assert (s1 >= s2 - 1e-5).all()
    assert ((theta >= 0) & (theta < np.pi)).all()
    # rebuild covariance from theta/sigmas and compare
    A, B, C = map(np.asarray, M.conic_from_theta_sigmas(
        jnp.asarray(theta), jnp.asarray(s1), jnp.asarray(s2)))
    # conic is the inverse covariance
    inv = np.stack([np.stack([A, B], -1), np.stack([B, C], -1)], -2)
    rebuilt = np.linalg.inv(inv)
    np.testing.assert_allclose(rebuilt, cov, rtol=5e-3, atol=1e-2)


def test_theta_packing_roundtrip():
    thetas = jnp.linspace(0.0, np.pi - 1e-4, 1000)
    packed = M.pack_theta_u16(thetas)
    unpacked = np.asarray(M.unpack_theta_u16(packed))
    np.testing.assert_allclose(unpacked, np.asarray(thetas), atol=np.pi / 65535.0)


def test_min_quad_rect_matches_bruteforce(rng):
    for _ in range(50):
        a = rng.uniform(0.01, 2)
        c = rng.uniform(0.01, 2)
        b = rng.uniform(-1, 1) * np.sqrt(a * c) * 0.9
        xmin, ymin = rng.uniform(-20, 10, 2)
        xmax, ymax = xmin + rng.uniform(0.5, 15), ymin + rng.uniform(0.5, 15)
        got = float(M.min_quad_rect(xmin, xmax, ymin, ymax, a, b, c))
        xs = np.linspace(xmin, xmax, 201)
        ys = np.linspace(ymin, ymax, 201)
        X, Y = np.meshgrid(xs, ys)
        brute = (a * X * X + 2 * b * X * Y + c * Y * Y).min()
        assert got <= brute + 1e-4
        # exact min should be close to dense-grid min
        assert got >= brute - max(0.05 * abs(brute), 0.05)


def test_sortable_uint_roundtrip(rng):
    vals = np.concatenate([
        rng.uniform(-100, 100, 1000).astype(np.float32),
        np.array([0.0, -0.0, 1e-30, -1e-30, 1e30, -1e30], np.float32)])
    keys = np.asarray(M.float_to_sortable_uint(jnp.asarray(vals)))
    back = np.asarray(M.sortable_uint_to_float(jnp.asarray(keys)))
    np.testing.assert_array_equal(back, vals)
    # order preservation
    order_v = np.argsort(vals, kind="stable")
    order_k = np.argsort(keys, kind="stable")
    np.testing.assert_array_equal(vals[order_v], vals[order_k])


def test_half_depth_key16_order(rng):
    d = rng.uniform(0.05, 100.0, 2000).astype(np.float32)
    keys = np.asarray(M.half_depth_key16(jnp.asarray(d)))
    d16 = d.astype(np.float16).astype(np.float32)
    # keys must order identically to the half-quantized depths
    ok = np.argsort(keys, kind="stable")
    assert (np.diff(d16[ok]) >= -1e-9).all()


def test_sh_color_degree0():
    # channel-planar storage layout: (3, n_coeffs, N)
    harm = jnp.ones((3, 1, 4))
    col = np.asarray(M.compute_sh_color(harm, jnp.zeros((4, 3)),
                                        jnp.zeros(3), 0))
    np.testing.assert_allclose(col, M.SH_C0, atol=1e-6)


def test_sh_color_direction_dependence(rng):
    harm = jnp.asarray(rng.normal(size=(3, 16, 1)), jnp.float32)
    pos = jnp.array([[0.0, 0.0, 5.0]])
    c1 = np.asarray(M.compute_sh_color(harm, pos, jnp.array([0.0, 0.0, 0.0]), 3))
    c2 = np.asarray(M.compute_sh_color(harm, pos, jnp.array([3.0, 1.0, 0.0]), 3))
    assert np.abs(c1 - c2).max() > 1e-4


def test_sh_color_matches_einsum(rng):
    n = 32
    harm_nat = rng.normal(size=(n, 16, 3)).astype(np.float32)
    harm = jnp.asarray(harm_nat.transpose(2, 1, 0))
    pos = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    center = jnp.array([1.0, 2.0, 3.0])
    got = np.asarray(M.compute_sh_color(harm, pos, center, 3))
    d = np.array([1.0, 2.0, 3.0]) - np.asarray(pos)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    basis = np.asarray(M.sh_basis(jnp.asarray(d), 3))
    want = np.einsum("nc,nck->nk", basis, harm_nat)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_projection_z_sign_agnostic():
    from gsm_renderer_tpu.camera import make_camera, make_look_at
    w, h = 640, 480
    pos_cv = np.array([[0.3, -0.2, 3.0]], np.float32)
    cam_cv = make_camera(w, h, convention="opencv")
    _, ndc_cv, depth_cv, vis_cv = M.project_points(
        jnp.asarray(pos_cv), jnp.asarray(cam_cv.view_matrix),
        jnp.asarray(cam_cv.projection_matrix), 0.1)
    # same point mirrored for OpenGL convention (-Z forward)
    pos_gl = pos_cv * np.array([1, 1, -1], np.float32)
    cam_gl = make_camera(w, h, convention="opengl")
    _, ndc_gl, depth_gl, vis_gl = M.project_points(
        jnp.asarray(pos_gl), jnp.asarray(cam_gl.view_matrix),
        jnp.asarray(cam_gl.projection_matrix), 0.1)
    assert bool(vis_cv[0]) and bool(vis_gl[0])
    np.testing.assert_allclose(np.asarray(depth_cv), np.asarray(depth_gl),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ndc_cv)[..., 0],
                               np.asarray(ndc_gl)[..., 0], rtol=1e-4, atol=1e-5)


def test_cull_predicates():
    assert bool(M.cull_by_scale(jnp.array([[1e-4, 2e-4, 3e-4]]))[0])
    assert not bool(M.cull_by_scale(jnp.array([[1e-4, 2e-4, 1e-3]]))[0])
    assert bool(M.cull_by_radius(jnp.array(0.4)))
    assert not bool(M.cull_by_radius(jnp.array(0.6)))
    assert bool(M.cull_by_far_plane(jnp.array(11.0), 10.0))
