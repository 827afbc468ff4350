"""Full-frame A/B: per-sub-block alive cond vs masked execution
(``sub_cond`` knob, kernels/blend.py) + bitwise output parity.

The knockout probe (scratch/blendprobe.py) measured the isolated blend stage
at 6.4-6.7 ms with the cond vs 5.9 without — the two scalar-gated lax.conds
per chunk cost more than the ~1.3 dead (fully-masked) sub-blocks per tile
they skip.  This confirms at full frame and checks output equality.
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
    from gsm_renderer_tpu import config as cfg
    from gsm_renderer_tpu.io.scene import generate_visible_gaussians
    from gsm_renderer_tpu.kernels import blend as K
    from gsm_renderer_tpu.ops import binning as B
    from gsm_renderer_tpu.ops.project import project_and_cull
    from gsm_renderer_tpu.pipelines.common import (fused_binning_words,
                                                   pack_record_words)

    n = 1_000_000
    w, h = 1920, 1080
    capacity = 3_002_368  # the adaptive lock-in at the headline scene
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

    def frame(sub_cond):
        def f(gi, view, proj, center):
            pr = project_and_cull(gi, view, proj, center, **kw)
            words = pack_record_words(pr.record)
            word_list = [words[:, k] for k in range(4)]
            sorted_tile, sw, total, _ovf = fused_binning_words(
                pr.visible, pr.min_tx, pr.min_ty, pr.max_tx, pr.rect_count,
                pr.depth_key, word_list, capacity=capacity, tiles_x=tiles_x,
                fused_depth16=False, use_pallas=True, exact_test=True,
                key_plan=plan)
            starts, counts_t = B.extract_tile_ranges(sorted_tile,
                                                     tiles_x * tiles_y)
            table = K.build_words_table(sw, capacity)
            tc, td = K.blend_tiles_pallas(table, starts, counts_t,
                                          tiles_x=tiles_x, tiles_y=tiles_y,
                                          sub_cond=sub_cond)
            color, depth = K.assemble_image(tc, td, tiles_x=tiles_x,
                                            tiles_y=tiles_y, width=w,
                                            height=h)
            return color, depth
        return jax.jit(f)

    args = (gi, view, proj, center)
    fa, fb = frame(True), frame(False)

    ca, da = fa(*args)
    cb, db = fb(*args)
    ca, da, cb, db = (np.asarray(x) for x in (ca, da, cb, db))
    print(f"color bitwise equal: {np.array_equal(ca, cb)}  "
          f"max|d|: {np.abs(ca - cb).max():.3g}", flush=True)
    print(f"depth bitwise equal: {np.array_equal(da, db)}  "
          f"max|d|: {np.abs(da - db).max():.3g}", flush=True)

    def t(f):
        def chain(k):
            best = 1e9
            for _ in range(4):
                t0 = time.perf_counter()
                for _ in range(k):
                    c, d = f(*args)
                np.asarray(d).ravel()[:1]
                best = min(best, time.perf_counter() - t0)
            return best
        t3, t13 = chain(3), chain(13)
        return (t13 - t3) / 10 * 1000

    for rep in range(3):
        ta, tb = t(fa), t(fb)
        print(f"rep{rep} full frame: cond {ta:.2f} ms  masked {tb:.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
