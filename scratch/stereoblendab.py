"""A/B stereo blend structure: single-pass dual-eye kernel (n_eyes=2) vs two
per-eye passes over the shared tile list — full stereo frame, real chip."""
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
    from gsm_renderer_tpu.ops.project import stereo_project_and_cull
    from gsm_renderer_tpu.pipelines.common import (binning_inputs,
                                                   pack_record_words)

    n = 1_000_000
    w, h = 1920, 1080
    capacity = 5_242_880
    tiles_x, tiles_y = cfg.tiles_for(w, h, 16, 16)
    ds = generate_visible_gaussians(n, sh_degree=3, scale_range=(0.002, 0.012))
    cam = G.make_camera(w, h, far=50.0)
    stereo = G.make_side_by_side_stereo(cam)
    gi = ds.to_input()
    views, projs, centers, st = stereo.astuple_jax()

    def frame(mode):
        def f(gi, views, projs, centers, st):
            pr = stereo_project_and_cull(
                gi, views, projs, centers, width=w, height=h, tile_w=16,
                tile_h=16, sh_degree=3, near_plane=0.1, far_plane=50.0,
                alpha_threshold=0.005, total_ink_threshold=2.0,
                input_is_srgb=False, scene_transform=st)
            words_l = pack_record_words(pr.record_left)
            words_r = pack_record_words(pr.record_right)
            wl = ([words_l[:, k] for k in range(3)]
                  + [words_r[:, k] for k in range(3)]
                  + [words_l[:, 3]])  # shared color word
            counts, rect_word, tile_mask, aux = binning_inputs(
                pr.visible, pr.min_tx, pr.min_ty, pr.max_tx, pr.rect_count,
                pr.depth_key, wl, exact_test="stereo_shared")
            outs = E.expand_slots_pallas(
                counts, rect_word, aux, capacity=capacity, tiles_x=tiles_x,
                fused_depth16=False, exact_test="stereo_shared", tile_mask=tile_mask)
            ops = jax.lax.sort((outs[0], outs[1], *outs[2:9]), num_keys=2)
            sorted_key, sw = ops[0], ops[2:]
            starts, counts_t = B.extract_tile_ranges(sorted_key,
                                                     tiles_x * tiles_y)
            if mode == "dual":
                table = K.build_words_table(list(sw) + [jnp.zeros_like(sw[0])], capacity)
                eye_raster = K.blend_tiles_pallas(
                    table, starts, counts_t, tiles_x=tiles_x, tiles_y=tiles_y,
                    r2_cutoff=9.0, n_eyes=2, shared_color=True)
            else:
                eye_raster = []
                for eye_words in ((sw[0], sw[1], sw[2], sw[6]),
                                  (sw[3], sw[4], sw[5], sw[6])):
                    table = K.build_words_table(list(eye_words), capacity)
                    eye_raster.append(K.blend_tiles_pallas(
                        table, starts, counts_t, tiles_x=tiles_x,
                        tiles_y=tiles_y, r2_cutoff=9.0))
            eyes = [K.assemble_image(tc, td, tiles_x=tiles_x, tiles_y=tiles_y,
                                     width=w, height=h)
                    for tc, td in eye_raster]
            color = jnp.concatenate([eyes[0][0], eyes[1][0]], axis=1)
            return color[0, 0, 0] + color[-1, -1, 1]
        return f

    args = (gi, views, projs, centers, st)

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
        t2, t4 = chain(2), chain(4)
        return (t4 - t2) / 2 * 1000

    for mode in ("dual", "two_pass"):
        print(f"stereo blend {mode}: {t(frame(mode)):.2f} ms/frame",
              flush=True)


main()
