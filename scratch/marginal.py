"""Marginal in-frame stage costs by STAGE DOUBLING: time the production
frame, then the same frame with one stage executed twice (second call on a
perturbed input so XLA cannot CSE it); the delta is that stage's true
marginal in-frame cost.  Avoids the cumulative-split's DCE bias (an
``upto(k)`` program lets XLA drop unused sort payloads / table planes, so
stage deltas near the cut line are misattributed — stage3.py's "blend
12.3 ms" vs the isolated chained 6.5 ms).
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

    def frame(double):
        def f(gi, view, proj, center):
            pr = project_and_cull(gi, view, proj, center, **kw)
            extra = jnp.float32(0.0)
            if double == "project":
                pr2 = project_and_cull(gi, view, proj, jnp.roll(center, 1),
                                       **kw)
                extra += pr2.depth_key[0].astype(jnp.float32)
            words = pack_record_words(pr.record)
            word_list = [words[:, k] for k in range(4)]
            bin_kw = dict(capacity=capacity, tiles_x=tiles_x,
                          fused_depth16=False, use_pallas=True,
                          exact_test=True, key_plan=plan)
            sorted_tile, sw, total, _ovf = fused_binning_words(
                pr.visible, pr.min_tx, pr.min_ty, pr.max_tx, pr.rect_count,
                pr.depth_key, word_list, **bin_kw)
            if double == "binsort":
                # second full expand+sort on a shifted depth word (same
                # distribution, different values -> no CSE)
                st2, sw2, _t2, _o2 = fused_binning_words(
                    pr.visible, pr.min_tx, pr.min_ty, pr.max_tx,
                    pr.rect_count, pr.depth_key ^ jnp.uint32(1), word_list,
                    **bin_kw)
                extra += st2[0].astype(jnp.float32) + sw2[0][-1].astype(
                    jnp.float32)
            starts, counts_t = B.extract_tile_ranges(sorted_tile,
                                                     tiles_x * tiles_y)
            table = K.build_words_table(sw, capacity)
            if double == "table":
                st3, ct3 = B.extract_tile_ranges(
                    jnp.roll(sorted_tile, 1), tiles_x * tiles_y)
                tab3 = K.build_words_table(
                    [x ^ jnp.uint32(1) for x in sw], capacity)
                extra += (st3[0] + ct3[0]).astype(jnp.float32) \
                    + tab3[0, 0, 0].astype(jnp.float32)
            tc, td = K.blend_tiles_pallas(table, starts, counts_t,
                                          tiles_x=tiles_x, tiles_y=tiles_y)
            if double == "blend":
                tc2, td2 = K.blend_tiles_pallas(
                    table, jnp.roll(starts, tiles_x),
                    jnp.roll(counts_t, tiles_x),
                    tiles_x=tiles_x, tiles_y=tiles_y)
                extra += tc2[0, 0, 0] + td2[-1, 0]
            color, depth = K.assemble_image(tc, td, tiles_x=tiles_x,
                                            tiles_y=tiles_y, width=w,
                                            height=h)
            return color[0, 0, 0] + depth[-1, -1] + extra
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
        t2, t8 = chain(2), chain(8)
        return (t8 - t2) / 6 * 1000

    stages = ["base", "project", "binsort", "table", "blend"]
    fns = {s: frame(None if s == "base" else s) for s in stages}
    for rep in range(2):
        base = None
        for s in stages:
            ms = t(fns[s])
            if s == "base":
                base = ms
                print(f"rep{rep} base frame: {ms:.2f} ms", flush=True)
            else:
                print(f"rep{rep} +{s:8s}: {ms:.2f} ms  (marginal "
                      f"{ms - base:+.2f})", flush=True)


if __name__ == "__main__":
    main()
