"""In-frame A/B: tie-free KeyPlan unstable sort vs stable 2-key sort at the
headline config.  Follows stabframe.py (which measured the stability-flag
cost on raw keys: unstable 23.4-23.6 vs stable 25.1-26.5 ms); this measures
the production KeyPlan path (normalized depth keys + index-carrying key2 +
is_stable=False) against the committed stable baseline, and checks output
parity."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

def main():
    import jax
    jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.0)
    import jax.numpy as jnp
    import gsm_renderer_tpu as G
    from gsm_renderer_tpu import config as cfg
    from gsm_renderer_tpu.io.scene import generate_visible_gaussians
    from gsm_renderer_tpu.kernels import blend as K
    from gsm_renderer_tpu.ops import binning as B
    from gsm_renderer_tpu.ops.project import project_and_cull
    from gsm_renderer_tpu.pipelines.common import (fused_binning,
                                                   pack_record_words)

    n = 1_000_000
    w, h = 1920, 1080
    capacity = 3_002_368
    tiles_x, tiles_y = cfg.tiles_for(w, h, 16, 16)
    ds = generate_visible_gaussians(n, sh_degree=3, scale_range=(0.002, 0.012))
    cam = G.make_camera(w, h, far=50.0)
    gi = ds.to_input()
    view, proj, center = cam.astuple_jax()
    kw = dict(width=w, height=h, tile_w=16, tile_h=16, sh_degree=3,
              near_plane=0.1, far_plane=50.0, alpha_threshold=0.005,
              total_ink_threshold=2.0, input_is_srgb=False)
    plan = B.make_key_plan(tiles_x * tiles_y, n, near_plane=0.1,
                           far_plane=50.0)
    print("plan:", plan)

    def frame(key_plan, full=False):
        def f(gi, view, proj, center):
            pr = project_and_cull(gi, view, proj, center, **kw)
            sorted_tile, sorted_words, _tl, _ovf, sw, _st = fused_binning(
                pr, pr.depth_key, capacity=capacity, tiles_x=tiles_x,
                fused_depth16=False, use_pallas=True, exact_test=True,
                key_plan=key_plan)
            starts, counts_t = B.extract_tile_ranges(sorted_tile,
                                                     tiles_x * tiles_y)
            table = K.build_words_table(sw, capacity)
            tc, td = K.blend_tiles_pallas(table, starts, counts_t,
                                          tiles_x=tiles_x, tiles_y=tiles_y)
            color, depth = K.assemble_image(tc, td, tiles_x=tiles_x,
                                            tiles_y=tiles_y, width=w, height=h)
            if full:
                return color, depth
            return color[0, 0, 0] + depth[-1, -1]
        return f

    args = (gi, view, proj, center)

    # parity first (cheap shapes would change compile; reuse full frame once)
    ca, da = jax.jit(frame(None, full=True))(*args)
    cb, db = jax.jit(frame(plan, full=True))(*args)
    ca, cb = np.asarray(ca), np.asarray(cb)
    print("color parity max|d|:", np.abs(ca - cb).max(),
          "bitwise:", (ca == cb).all())

    def t(fn):
        f = jax.jit(fn)
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
        t3, t6 = chain(3), chain(6)
        return (t6 - t3) / 3 * 1000

    for mode in ("stable", "plan", "stable", "plan", "stable", "plan"):
        kp = plan if mode == "plan" else None
        print(f"{mode}: {t(frame(kp)):.2f} ms/frame", flush=True)

main()
