"""Sweep per-program compiler options targeting the composed-sort MSA
pathology (see BACKLOG.md): the default compile lets memory-space-assignment
slice-prefetch the sort's operands into VMEM (S(1)), starving the sort
emitter's scratch — composed sort 10.3 ms vs 4.5 standalone.  131072 KiB
scoped-vmem kills ALL S(1) (sort 3.9 but frame +8).  This sweeps the middle
ground: intermediate scoped-vmem limits, and `xla_tpu_sliced_prefetch_max_
slices` which disables exactly the slice-prefetch mechanism without evicting
MSA's other wins.  Times the FULL production frame; checks bitwise parity.
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

    # msa_sort_order_overrides: textproto MsaSortOrderOverrides — push
    # matched buffers to the END of MSA's assignment order so they lose the
    # VMEM contention (surgical vs the program-wide scoped-vmem hammer)
    sortlast = ('overrides { hlo_position_matcher { '
                'instruction_name_regex: "sort.*" } '
                'override_options { assign_last: true } }')
    biglast = ('overrides { hlo_position_matcher { size_gte: 10000000 } '
               'override_options { assign_last: true } }')
    configs = {
        "default": None,
        "slices0": {"xla_tpu_sliced_prefetch_max_slices": "0"},
        "slices1": {"xla_tpu_sliced_prefetch_max_slices": "1"},
        "vmem98304": {"xla_tpu_scoped_vmem_limit_kib": "98304"},
        "vmem65536": {"xla_tpu_scoped_vmem_limit_kib": "65536"},
        "sortlast": {"xla_tpu_msa_sort_order_overrides": sortlast},
        "biglast": {"xla_tpu_msa_sort_order_overrides": biglast},
    }
    if len(sys.argv) > 1:
        keep = set(sys.argv[1].split(","))
        configs = {k: v for k, v in configs.items() if k in keep}

    progs = {}
    for name, opts in configs.items():
        t0 = time.perf_counter()
        try:
            lw = jax.jit(f).lower(*args)
            progs[name] = (lw.compile(compiler_options=opts) if opts
                           else lw.compile())
            print(f"compiled {name} in {time.perf_counter()-t0:.0f}s",
                  flush=True)
        except Exception as e:  # noqa: BLE001 - report and continue sweep
            print(f"compile {name} FAILED: {type(e).__name__}: {e}",
                  flush=True)

    ref = None
    for name, p in progs.items():
        c2, d2 = (np.asarray(x) for x in p(*args))
        if ref is None:
            ref = (c2, d2)
            continue
        print(f"{name}: color equal {np.array_equal(ref[0], c2)} "
              f"depth equal {np.array_equal(ref[1], d2)}", flush=True)

    def chain8(p):
        t0 = time.perf_counter()
        for _ in range(8):
            r = p(*args)
        np.asarray(r[1]).ravel()[:1]
        return (time.perf_counter() - t0) / 8 * 1000

    # warm
    for p in progs.values():
        chain8(p)
    # tightly interleaved: per-frame time incl. the (identical) dispatch
    # overhead; the DIFFERENCE between variants is the signal
    res = {name: [] for name in progs}
    for rep in range(8):
        for name, p in progs.items():
            res[name].append(chain8(p))
    for name, xs in res.items():
        xs = sorted(xs)
        print(f"{name}: median {xs[len(xs)//2]:6.2f}  min {xs[0]:6.2f}  "
              f"all {['%.1f' % x for x in xs]}", flush=True)


if __name__ == "__main__":
    main()
