"""Localize the blend kernel's bound with knockout probes (probe knob in
kernels/blend.py): isolated blend-stage timing on a fixed prebuilt table at
the headline scene.

  baseline  full kernel (vpu / split16 defaults)
  floor     DMA + chunk-walk skeleton only (no (128,P) compute)
  nocond    per-sub-block alive cond removed (masked execution)
  noexp     rational alpha surrogate (no exp/log transcendentals)
  noscan    exclusive prefix ones + product reduce (scan knocked out)

Interpretation: baseline-floor = compute; baseline-noexp = exp cost;
baseline-noscan ~= scan-minus-reduce (~5 of 12 op-equivalents); nocond
faster => the 2-per-chunk conds cost more than the dead sub-blocks they
skip.
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

    @jax.jit
    def prep(gi, view, proj, center):
        pr = project_and_cull(gi, view, proj, center, **kw)
        words = pack_record_words(pr.record)
        word_list = [words[:, k] for k in range(4)]
        counts, rect_word, tile_mask, aux = binning_inputs(
            pr.visible, pr.min_tx, pr.min_ty, pr.max_tx, pr.rect_count,
            pr.depth_key, word_list, exact_test=True)
        key, d_slot, w0, w1, w2, w3, total, _ovf = E.expand_slots_pallas(
            counts, rect_word, aux, capacity=capacity, tiles_x=tiles_x,
            fused_depth16=False, exact_test=True, tile_mask=tile_mask)
        ops = jax.lax.sort((key, d_slot, w0, w1, w2, w3), num_keys=2)
        sorted_key, sw = ops[0], ops[2:]
        starts, counts_t = B.extract_tile_ranges(sorted_key,
                                                 tiles_x * tiles_y)
        table = K.build_words_table(sw, capacity)
        return table, starts, counts_t

    table, starts, counts_t = jax.block_until_ready(
        prep(gi, view, proj, center))
    np.asarray(starts)[:1]

    def mk(probe):
        def f(table, starts, counts_t):
            tc, td = K.blend_tiles_pallas(table, starts, counts_t,
                                          tiles_x=tiles_x, tiles_y=tiles_y,
                                          probe=probe)
            return tc[0, 0, 0] + td[-1, 0]
        return jax.jit(f)

    def t(f):
        np.asarray(f(table, starts, counts_t)).ravel()[:1]

        def chain(k):
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(k):
                    r = f(table, starts, counts_t)
                np.asarray(r).ravel()[:1]
                best = min(best, time.perf_counter() - t0)
            return best
        t2, t6 = chain(2), chain(6)
        return (t6 - t2) / 4 * 1000

    probes = ["", "floor", "nocond", "noexp", "noscan"]
    fns = {p: mk(p) for p in probes}
    # two interleaved passes: session drift shows up as pass-to-pass delta
    for rep in range(2):
        for p in probes:
            ms = t(fns[p])
            print(f"rep{rep} probe={p or 'baseline':8s}: {ms:6.2f} ms",
                  flush=True)

    # --- replicate the IN-FRAME table conditions (keyplan unstable sort,
    # adaptive 3.0M capacity) to chase the isolated-6.5 vs marginal-13 gap
    from gsm_renderer_tpu.pipelines.common import fused_binning_words
    cap2 = 3_002_368
    plan = B.make_key_plan(tiles_x * tiles_y, n, near_plane=0.1,
                           far_plane=50.0)

    @jax.jit
    def prep2(gi, view, proj, center):
        pr = project_and_cull(gi, view, proj, center, **kw)
        words = pack_record_words(pr.record)
        word_list = [words[:, k] for k in range(4)]
        sorted_tile, sw, total, _ovf = fused_binning_words(
            pr.visible, pr.min_tx, pr.min_ty, pr.max_tx, pr.rect_count,
            pr.depth_key, word_list, capacity=cap2, tiles_x=tiles_x,
            fused_depth16=False, use_pallas=True, exact_test=True,
            key_plan=plan)
        starts, counts_t = B.extract_tile_ranges(sorted_tile,
                                                 tiles_x * tiles_y)
        table = K.build_words_table(sw, cap2)
        return table, starts, counts_t

    table2, starts2, counts2 = jax.block_until_ready(
        prep2(gi, view, proj, center))
    np.asarray(starts2)[:1]

    def mk2(probe):
        def f(table, starts, counts_t):
            tc, td = K.blend_tiles_pallas(table, starts, counts_t,
                                          tiles_x=tiles_x, tiles_y=tiles_y,
                                          probe=probe)
            return tc[0, 0, 0] + td[-1, 0]
        return jax.jit(f)

    def t2(f):
        np.asarray(f(table2, starts2, counts2)).ravel()[:1]

        def chain(k):
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(k):
                    r = f(table2, starts2, counts2)
                np.asarray(r).ravel()[:1]
                best = min(best, time.perf_counter() - t0)
            return best
        a, b = chain(2), chain(6)
        return (b - a) / 4 * 1000

    f2 = mk2("")
    for rep in range(2):
        print(f"rep{rep} keyplan/3.0M table baseline: {t2(f2):6.2f} ms "
              f"(old-table baseline again: {t(fns['']):6.2f})", flush=True)

    # --- hypothesis: the in-frame marginal (13 ms vs 6 isolated) is the
    # table MATERIALIZATION boundary: build the table in-program from
    # committed sorted planes, then blend
    @jax.jit
    def prep3(gi, view, proj, center):
        pr = project_and_cull(gi, view, proj, center, **kw)
        words = pack_record_words(pr.record)
        word_list = [words[:, k] for k in range(4)]
        sorted_tile, sw, total, _ovf = fused_binning_words(
            pr.visible, pr.min_tx, pr.min_ty, pr.max_tx, pr.rect_count,
            pr.depth_key, word_list, capacity=cap2, tiles_x=tiles_x,
            fused_depth16=False, use_pallas=True, exact_test=True,
            key_plan=plan)
        starts, counts_t = B.extract_tile_ranges(sorted_tile,
                                                 tiles_x * tiles_y)
        return sw, starts, counts_t

    sw3, starts3, counts3 = jax.block_until_ready(
        prep3(gi, view, proj, center))
    np.asarray(starts3)[:1]

    def f3(sw, starts, counts_t):
        table = K.build_words_table(sw, cap2)
        tc, td = K.blend_tiles_pallas(table, starts, counts_t,
                                      tiles_x=tiles_x, tiles_y=tiles_y)
        return tc[0, 0, 0] + td[-1, 0]
    f3 = jax.jit(f3)

    def t3():
        np.asarray(f3(sw3, starts3, counts3)).ravel()[:1]

        def chain(k):
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(k):
                    r = f3(sw3, starts3, counts3)
                np.asarray(r).ravel()[:1]
                best = min(best, time.perf_counter() - t0)
            return best
        a, b = chain(2), chain(6)
        return (b - a) / 4 * 1000

    for rep in range(2):
        print(f"rep{rep} table-in-program blend: {t3():6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
