"""Stereo frame stage split (project / expand / sort / table / blend /
assemble) — cumulative-prefix deltas, real chip."""
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
    capacity = 4_718_592  # the stereo adaptive lock-in at this scene
    tiles_x, tiles_y = cfg.tiles_for(w, h, 16, 16)
    ds = generate_visible_gaussians(n, sh_degree=3, scale_range=(0.002, 0.012))
    cam = G.make_camera(w, h, far=50.0)
    stereo = G.make_side_by_side_stereo(cam)
    gi = ds.to_input()
    views, projs, centers, st = stereo.astuple_jax()

    def upto(stage):
        def f(gi, views, projs, centers, st):
            pr = stereo_project_and_cull(
                gi, views, projs, centers, width=w, height=h, tile_w=16,
                tile_h=16, sh_degree=3, near_plane=0.1, far_plane=50.0,
                alpha_threshold=0.005, total_ink_threshold=2.0,
                input_is_srgb=False, scene_transform=st)
            if stage == 1:
                return pr.depth_key.max() + jnp.uint32(pr.rect_count.sum())
            words_l = pack_record_words(pr.record_left)
            words_r = pack_record_words(pr.record_right)
            wl = ([words_l[:, k] for k in range(4)]
                  + [words_r[:, k] for k in range(4)])
            # production path: fused Pallas prep (stereo mode) + expand
            from gsm_renderer_tpu.pipelines.common import fused_binning_words
            rect_w = pr.max_tx - pr.min_tx + 1
            rect_word0 = B.pack_rect_word(pr.min_tx, pr.min_ty, rect_w)
            rect_word0 = jnp.where(pr.visible, rect_word0,
                                   rect_word0 | jnp.uint32(E.CULLED_BIT))
            rect_h = pr.rect_count // jnp.maximum(rect_w, 1)
            tab = E.binning_prep_pallas(
                rect_word0, rect_h, pr.depth_key.astype(jnp.uint32),
                [w_.astype(jnp.uint32) for w_ in wl], mode="stereo")
            outs = E.expand_slots_pallas(
                None, None, None, capacity=capacity, tiles_x=tiles_x,
                fused_depth16=False, exact_test="stereo", prebuilt_tab=tab,
                n_gaussians=pr.visible.shape[0])
            key, d_slot = outs[0], outs[1]
            if stage == 2:
                return key[0] + outs[2][-1]
            ops = jax.lax.sort((key, d_slot, *outs[2:10]), num_keys=2)
            sorted_key, sw = ops[0], ops[2:]
            if stage == 3:
                return sorted_key[-1] + sw[0][0]
            starts, counts_t = B.extract_tile_ranges(sorted_key,
                                                     tiles_x * tiles_y)
            table = K.build_words_table(list(sw), capacity)
            if stage == 4:
                return jnp.uint32(table[0, 0, 0]) + jnp.uint32(starts[0])
            eye_raster = K.blend_tiles_pallas(
                table, starts, counts_t, tiles_x=tiles_x, tiles_y=tiles_y,
                r2_cutoff=9.0, n_eyes=2)
            if stage == 5:
                return jnp.uint32(eye_raster[0][0][0, 0, 0]
                                  + eye_raster[1][1][-1, 0])
            eyes = [K.assemble_image(tc, td, tiles_x=tiles_x, tiles_y=tiles_y,
                                     width=w, height=h)
                    for tc, td in eye_raster]
            color = jnp.concatenate([eyes[0][0], eyes[1][0]], axis=1)
            return jnp.uint32(color[0, 0, 0] + color[-1, -1, 0])
        return f

    args = (gi, views, projs, centers, st)

    def t(fn):
        f = jax.jit(fn)
        np.asarray(f(*args)).ravel()[:1]
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(4):
                r = f(*args)
            np.asarray(r).ravel()[:1]
            best = min(best, (time.perf_counter() - t0) / 4)
        return best * 1000

    prev = 0.0
    names = ["project", "expand", "sort", "ranges+table", "blend", "assemble"]
    for i, nm in enumerate(names, 1):
        cum = t(upto(i))
        print(f"{nm}: {cum - prev:.2f} ms (cum {cum:.2f})", flush=True)
        prev = cum


main()
