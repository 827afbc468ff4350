"""In-frame A/B of the fused-binning sort's is_stable flag at the headline
config.  Standalone harness (sortstabab.py): unstable2 12.5-13.0 vs stable2
13.6-15.3 ms on random keys — measure what survives in the full frame."""
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
    from gsm_renderer_tpu.kernels import blend as K, expand as E
    from gsm_renderer_tpu.ops import binning as B
    from gsm_renderer_tpu.ops.project import project_and_cull
    from gsm_renderer_tpu.pipelines.common import binning_inputs, pack_record_words

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

    def frame(stable):
        def f(gi, view, proj, center):
            pr = project_and_cull(gi, view, proj, center, **kw)
            words = pack_record_words(pr.record)
            wl = [words[:, k] for k in range(4)]
            counts, rect_word, tile_mask, aux = binning_inputs(
                pr.visible, pr.min_tx, pr.min_ty, pr.max_tx, pr.rect_count,
                pr.depth_key, wl, exact_test=True)
            key, d_slot, w0, w1, w2, w3, total, _ovf = E.expand_slots_pallas(
                counts, rect_word, aux, capacity=capacity, tiles_x=tiles_x,
                fused_depth16=False, exact_test=True, tile_mask=tile_mask)
            ops = jax.lax.sort((key, d_slot, w0, w1, w2, w3), num_keys=2,
                               is_stable=stable)
            sorted_key, sw = ops[0], ops[2:]
            starts, counts_t = B.extract_tile_ranges(sorted_key,
                                                     tiles_x * tiles_y)
            table = K.build_words_table(sw, capacity)
            tc, td = K.blend_tiles_pallas(table, starts, counts_t,
                                          tiles_x=tiles_x, tiles_y=tiles_y)
            color, depth = K.assemble_image(tc, td, tiles_x=tiles_x,
                                            tiles_y=tiles_y, width=w, height=h)
            return color[0, 0, 0] + depth[-1, -1]
        return f

    args = (gi, view, proj, center)

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

    for stable in (True, False, True, False, True, False):
        print(f"is_stable={stable}: {t(frame(stable)):.2f} ms/frame",
              flush=True)

main()
