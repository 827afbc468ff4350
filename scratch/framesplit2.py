"""Cut-point split of the PRE-BLEND pipeline (the real 16.5 ms of the
22.7 ms frame, scratch/framesplit.py): each cut is its own program touching
single elements of every output (Pallas calls are opaque so one element
retains the full kernel; the sort's operands are all touched).
Cuts: project | +prep(pallas tab) | +expand | +sort | +ranges | full frame.
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
    from gsm_renderer_tpu.pipelines.common import pack_record_words

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

    def build(stage):
        def f(gi, view, proj, center):
            pr = project_and_cull(gi, view, proj, center, **kw)
            words = pack_record_words(pr.record)
            word_list = [words[:, k] for k in range(4)]
            if stage == "project":
                s = pr.depth_key[0].astype(jnp.float32) \
                    + pr.min_tx[1].astype(jnp.float32) \
                    + pr.min_ty[2].astype(jnp.float32) \
                    + pr.max_tx[3].astype(jnp.float32) \
                    + pr.rect_count[4].astype(jnp.float32) \
                    + pr.visible[5].astype(jnp.float32)
                for k in range(4):
                    s = s + word_list[k][k].astype(jnp.float32)
                return s
            dsw = plan.normalize(pr.depth_key)
            rect_w = pr.max_tx - pr.min_tx + 1
            rect_word0 = B.pack_rect_word(pr.min_tx, pr.min_ty, rect_w)
            rect_word0 = jnp.where(pr.visible, rect_word0,
                                   rect_word0 | jnp.uint32(E.CULLED_BIT))
            rect_h = pr.rect_count // jnp.maximum(rect_w, 1)
            tab = E.binning_prep_pallas(
                rect_word0, rect_h, dsw.astype(jnp.uint32),
                [x.astype(jnp.uint32) for x in word_list],
                tile_w=16, tile_h=16, alpha_threshold=0.005, mode="mono")
            if stage == "prep":
                if isinstance(tab, (tuple, list)):
                    return sum(jnp.ravel(x)[0].astype(jnp.float32)
                               for x in tab)
                return tab.ravel()[0].astype(jnp.float32)
            outs = E.expand_slots_pallas(
                None, None, None, capacity=cap, tiles_x=tiles_x,
                fused_depth16=False, exact_test=True, tile_w=16, tile_h=16,
                alpha_threshold=0.005, prebuilt_tab=tab, n_gaussians=n,
                key_plan=plan.kernel_tuple)
            key, d_slot = outs[0], outs[1]
            slot_words = outs[2:-2]
            if stage == "expand":
                s = key[0].astype(jnp.float32) + d_slot[1].astype(jnp.float32)
                for k, x in enumerate(slot_words):
                    s = s + x[k].astype(jnp.float32)
                return s
            ops = jax.lax.sort((key, d_slot, *slot_words), num_keys=2,
                               is_stable=False)
            sorted_key, sw = ops[0], ops[2:]
            if stage == "sort":
                s = sorted_key[0].astype(jnp.float32) \
                    + ops[1][1].astype(jnp.float32)
                for k, x in enumerate(sw):
                    s = s + x[k].astype(jnp.float32)
                return s
            sorted_tile = jnp.where(sorted_key == jnp.uint32(E.SENTINEL),
                                    jnp.uint32(E.SENTINEL),
                                    sorted_key >> plan.kernel_tuple[0])
            starts, counts_t = B.extract_tile_ranges(sorted_tile,
                                                     tiles_x * tiles_y)
            if stage == "ranges":
                s = starts[0].astype(jnp.float32) \
                    + counts_t[-1].astype(jnp.float32)
                for k, x in enumerate(sw):
                    s = s + x[k].astype(jnp.float32)
                return s
            table = K.build_words_table(sw, cap)
            tc, td = K.blend_tiles_pallas(table, starts, counts_t,
                                          tiles_x=tiles_x, tiles_y=tiles_y)
            color, depth = K.assemble_image(tc, td, tiles_x=tiles_x,
                                            tiles_y=tiles_y, width=w,
                                            height=h)
            return color[0, 0, 0] + depth[-1, -1]
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
        a, b = chain(2), chain(8)
        return (b - a) / 6 * 1000

    stages = ["project", "prep", "expand", "sort", "ranges", "full"]
    fns = {s: build(s) for s in stages}
    for rep in range(2):
        prev = 0.0
        for s in stages:
            ms = t(fns[s])
            print(f"rep{rep} {s:8s}: cum {ms:6.2f} ms  (+{ms - prev:.2f})",
                  flush=True)
            prev = ms


if __name__ == "__main__":
    main()
