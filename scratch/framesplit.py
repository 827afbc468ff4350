"""Two-program frame split: time (A) the pipeline up to ranges (project +
fused expand/sort + ranges, big outputs stay on device) and (B) the full
frame, in ONE process.  B - A bounds the true in-frame cost of
table+blend+assemble without the stage-doubling method's second-order
scheduling effects (scratch/marginal.py) or the cumulative split's DCE bias
(scratch/stage3.py).
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
    cap = 3_002_368
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

    def upto_ranges(gi, view, proj, center):
        pr = project_and_cull(gi, view, proj, center, **kw)
        words = pack_record_words(pr.record)
        word_list = [words[:, k] for k in range(4)]
        sorted_tile, sw, total, _ovf = fused_binning_words(
            pr.visible, pr.min_tx, pr.min_ty, pr.max_tx, pr.rect_count,
            pr.depth_key, word_list, capacity=cap, tiles_x=tiles_x,
            fused_depth16=False, use_pallas=True, exact_test=True,
            key_plan=plan)
        starts, counts_t = B.extract_tile_ranges(sorted_tile,
                                                 tiles_x * tiles_y)
        return sw, starts, counts_t

    def full(gi, view, proj, center):
        sw, starts, counts_t = upto_ranges(gi, view, proj, center)
        table = K.build_words_table(sw, cap)
        tc, td = K.blend_tiles_pallas(table, starts, counts_t,
                                      tiles_x=tiles_x, tiles_y=tiles_y)
        color, depth = K.assemble_image(tc, td, tiles_x=tiles_x,
                                        tiles_y=tiles_y, width=w, height=h)
        return color[0, 0, 0] + depth[-1, -1]

    def a_fn(gi, view, proj, center):
        # touch ALL sorted planes so XLA cannot drop sort operands
        sw, starts, counts_t = upto_ranges(gi, view, proj, center)
        s = starts[0].astype(jnp.float32) + counts_t[-1].astype(jnp.float32)
        for k in range(4):
            s = s + sw[k][k].astype(jnp.float32)
        return s
    fa = jax.jit(a_fn)
    fb = jax.jit(full)

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
        a, b = chain(2), chain(8)
        return (b - a) / 6 * 1000

    for rep in range(3):
        ta, tb = t(fa), t(fb)
        print(f"rep{rep} upto-ranges {ta:6.2f} ms   full {tb:6.2f} ms   "
              f"delta(table+blend+assemble) {tb - ta:+.2f}", flush=True)


if __name__ == "__main__":
    main()
