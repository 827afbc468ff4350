"""Full-frame A/B of xla_tpu_scoped_vmem_limit_kib: the default lets XLA's
memory-space-assignment pin the sort's operands into alternate memory (VMEM,
S(1) layouts, async slice-prefetches), starving the sort emitter's scratch —
the composed 3.0M 2-key sort runs 10.4-12.3 ms vs 4.5 standalone; at
131072 KiB MSA gets nothing, S(1) disappears and the same composed sort runs
3.9 ms (scratch/sortreal.py, sortchain.py, HLO dumps).  This times the FULL
production frame compiled both ways and checks bitwise parity.
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
                                      tiles_x=tiles_x, tiles_y=tiles_y)
        color, depth = K.assemble_image(tc, td, tiles_x=tiles_x,
                                        tiles_y=tiles_y, width=w, height=h)
        return color, depth

    args = (gi, view, proj, center)
    lowered = jax.jit(f).lower(*args)
    prog_def = lowered.compile()
    progs = {"default": prog_def}
    for kib in (114688, 131072):
        progs[str(kib)] = jax.jit(f).lower(*args).compile(
            compiler_options={"xla_tpu_scoped_vmem_limit_kib": str(kib)})

    cd, dd = (np.asarray(x) for x in prog_def(*args))
    for name, p in progs.items():
        c2, d2 = (np.asarray(x) for x in p(*args))
        print(f"{name}: color equal {np.array_equal(cd, c2)} "
              f"depth equal {np.array_equal(dd, d2)}", flush=True)

    def t(p):
        np.asarray(p(*args)[1]).ravel()[:1]

        def chain(k):
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(k):
                    r = p(*args)
                np.asarray(r[1]).ravel()[:1]
                best = min(best, time.perf_counter() - t0)
            return best
        a, b = chain(2), chain(8)
        return (b - a) / 6 * 1000

    for rep in range(3):
        row = "  ".join(f"{name} {t(p):6.2f} ms" for name, p in progs.items())
        print(f"rep{rep}: {row}", flush=True)


if __name__ == "__main__":
    main()
