"""Decompose the project+cull stage cost (cut profiler: ~2.7 ms at 1M/SH3).

Cut-point programs (every live operand touched): sh-only | cov-chain-only |
full project | project+pack.  Slope-timed chains.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.0)
    import jax.numpy as jnp

    import gsm_renderer_tpu as G
    from gsm_renderer_tpu import mathlib as M
    from gsm_renderer_tpu.io.scene import generate_visible_gaussians
    from gsm_renderer_tpu.ops.project import project_and_cull
    from gsm_renderer_tpu.pipelines.common import pack_record_words

    n = 1_000_000
    w, h = 1920, 1080
    ds = generate_visible_gaussians(n, sh_degree=3, scale_range=(0.002, 0.012))
    cam = G.make_camera(w, h, far=50.0)
    gi = ds.to_input()
    view, proj, center = cam.astuple_jax()
    kw = dict(width=w, height=h, tile_w=16, tile_h=16, sh_degree=3,
              near_plane=0.1, far_plane=50.0, alpha_threshold=0.005,
              total_ink_threshold=2.0, input_is_srgb=False)

    def build(stage):
        def f(gi, view, proj, center):
            f32 = jnp.float32
            px = gi.positions[..., 0].astype(f32)
            py = gi.positions[..., 1].astype(f32)
            pz = gi.positions[..., 2].astype(f32)
            if stage == "slices":
                return px[0] + py[1] + pz[2]
            if stage == "sh":
                color = M.compute_sh_color_c(gi.harmonics, px, py, pz,
                                             center.astype(f32), 3)
                return color[0, 0] + color[1, 1] + color[2, 2]
            if stage == "cov":
                sx = gi.scales[..., 0].astype(f32)
                sy = gi.scales[..., 1].astype(f32)
                sz = gi.scales[..., 2].astype(f32)
                vx, vy, vz, nx, ny, depth, in_front = M.project_points_c(
                    px, py, pz, view, proj, 0.1)
                c3d = M.build_covariance_3d_c(
                    sx, sy, sz,
                    gi.rotations[..., 0].astype(f32),
                    gi.rotations[..., 1].astype(f32),
                    gi.rotations[..., 2].astype(f32),
                    gi.rotations[..., 3].astype(f32))
                ca, cb, cd = M.project_covariance_2d_c(
                    c3d, vx, vy, vz, view[:3, :3], proj, float(w), float(h))
                ca, cb, cd = M.stabilize_covariance_2d_c(ca, cb, cd,
                                                         float(w), float(h))
                theta, s1, s2, ok = M.covariance_to_theta_sigmas_c(ca, cb, cd)
                return (theta[0] + s1[1] + s2[2] + ok[3]
                        + depth[4] + nx[5] + ny[6])
            pr = project_and_cull(gi, view, proj, center, **kw)
            s = pr.depth_key[0].astype(jnp.float32) \
                + pr.min_tx[1].astype(jnp.float32) \
                + pr.min_ty[2].astype(jnp.float32) \
                + pr.max_tx[3].astype(jnp.float32) \
                + pr.rect_count[4].astype(jnp.float32) \
                + pr.visible[5].astype(jnp.float32)
            if stage == "project":
                return (s + pr.record.mean_x[0].astype(jnp.float32)
                        + pr.record.theta[1].astype(jnp.float32)
                        + pr.record.sigma2[2].astype(jnp.float32)
                        + pr.record.color[3, 0].astype(jnp.float32))
            words = pack_record_words(pr.record)
            for k in range(4):
                s = s + words[k, k].astype(jnp.float32)
            return s
        return jax.jit(f)

    args = (gi, view, proj, center)

    def t(f):
        np.asarray(f(*args)).ravel()[:1]

        def chain(k):
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(k):
                    r = f(*args)
                np.asarray(r).ravel()[:1]
                best = min(best, time.perf_counter() - t0)
            return best
        a, b = chain(2), chain(10)
        return (b - a) / 8 * 1000

    stages = ["slices", "sh", "cov", "project", "pack"]
    fns = {s: build(s) for s in stages}
    for rep in range(3):
        print("  ".join(f"{s} {t(fns[s]):5.2f}" for s in stages), flush=True)


if __name__ == "__main__":
    main()
