"""Lean 3-point stage split: project | binning+sort | blend+assemble.

Usage: python scratch/stage3.py [n]
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
    from gsm_renderer_tpu.kernels import expand as E
    from gsm_renderer_tpu.ops import binning as B
    from gsm_renderer_tpu.ops.project import project_and_cull
    from gsm_renderer_tpu.pipelines.common import (binning_inputs,
                                                   pack_record_words)

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    w, h = 1920, 1080
    capacity = -(-(4 * n) // 4096) * 4096
    tiles_x, tiles_y = cfg.tiles_for(w, h, 16, 16)
    ds = generate_visible_gaussians(n, sh_degree=3, scale_range=(0.002, 0.012))
    cam = G.make_camera(w, h, far=50.0)
    gi = ds.to_input()
    view, proj, center = cam.astuple_jax()
    kw = dict(width=w, height=h, tile_w=16, tile_h=16, sh_degree=3,
              near_plane=0.1, far_plane=50.0, alpha_threshold=0.005,
              total_ink_threshold=2.0, input_is_srgb=False)

    def upto(stage):
        def f(gi, view, proj, center):
            pr = project_and_cull(gi, view, proj, center, **kw)
            if stage == 1:
                return pr.depth_key.max() + jnp.uint32(pr.rect_count.sum())
            words = pack_record_words(pr.record)
            word_list = [words[:, k] for k in range(4)]
            counts, rect_word, tile_mask, aux = binning_inputs(
                pr.visible, pr.min_tx, pr.min_ty, pr.max_tx, pr.rect_count,
                pr.depth_key, word_list, exact_test=True)
            key, d_slot, w0, w1, w2, w3, total, _ovf = E.expand_slots_pallas(
                counts, rect_word, aux, capacity=capacity, tiles_x=tiles_x,
                fused_depth16=False, exact_test=True, tile_mask=tile_mask)
            if stage == 2:
                return key[0] + w0[-1]
            ops = jax.lax.sort((key, d_slot, w0, w1, w2, w3), num_keys=2)
            sorted_key, sw = ops[0], ops[2:]
            if stage == 3:
                return sorted_key[-1] + sw[0][0]
            starts, counts_t = B.extract_tile_ranges(sorted_key,
                                                     tiles_x * tiles_y)
            table = K.build_words_table(sw, capacity)
            if stage == 4:
                return jnp.uint32(table[0, 0, 0]) + jnp.uint32(starts[0])
            tc, td = K.blend_tiles_pallas(table, starts, counts_t,
                                          tiles_x=tiles_x, tiles_y=tiles_y)
            if stage == 5:
                return jnp.uint32(tc[0, 0, 0] + td[-1, 0])
            color, depth = K.assemble_image(tc, td, tiles_x=tiles_x,
                                            tiles_y=tiles_y, width=w, height=h)
            return jnp.uint32(color[0, 0, 0] + depth[-1, -1])
        return f

    args = (gi, view, proj, center)

    def t(fn):
        f = jax.jit(fn)
        r = f(*args)
        np.asarray(r).ravel()[:1]
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(4):
                r = f(*args)
            np.asarray(r).ravel()[:1]
            best = min(best, (time.perf_counter() - t0) / 4)
        return best * 1000

    f0 = jax.jit(lambda x: x + 1)
    x0 = jnp.zeros(())
    np.asarray(f0(x0))
    t0 = time.perf_counter()
    for _ in range(4):
        np.asarray(f0(x0))
    print(f"overhead(sync)/iter: {(time.perf_counter()-t0)/4*1000:.2f} ms",
          flush=True)

    prev = 0.0
    names = ["project", "expand", "sort", "ranges+table", "blend", "assemble"]
    for i, nm in enumerate(names, 1):
        cum = t(upto(i))
        print(f"{nm}: {cum - prev:.2f} ms (cum {cum:.2f})", flush=True)
        prev = cum


if __name__ == "__main__":
    main()
