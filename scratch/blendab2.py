"""A/B blend compute dtype (f32 vs bf16) + in-kernel expand rowbase on the
real chip (full-frame slope timing)."""
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
    from gsm_renderer_tpu.pipelines.common import pack_record_words

    n = 1_000_000
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

    def frame(dtype):
        def f(gi, view, proj, center):
            pr = project_and_cull(gi, view, proj, center, **kw)
            words = pack_record_words(pr.record)
            rect_word = B.pack_rect_word(pr.min_tx, pr.min_ty,
                                         (pr.max_tx - pr.min_tx + 1))
            rect_word = jnp.where(pr.visible, rect_word,
                                  rect_word | jnp.uint32(E.CULLED_BIT))
            counts = jnp.maximum(pr.rect_count, 1)
            aux = [pr.depth_key] + [words[:, k] for k in range(4)]
            key, d_slot, w0, w1, w2, w3, total, _ovf = E.expand_slots_pallas(
                counts, rect_word, aux, capacity=capacity, tiles_x=tiles_x,
                fused_depth16=False, exact_test=True)
            ops = jax.lax.sort((key, d_slot, w0, w1, w2, w3), num_keys=2)
            sorted_key, sw = ops[0], ops[2:]
            starts, counts_t = B.extract_tile_ranges(sorted_key, tiles_x * tiles_y)
            table = K.build_words_table(sw, capacity)
            tc, td = K.blend_tiles_pallas(table, starts, counts_t,
                                          tiles_x=tiles_x, tiles_y=tiles_y,
                                          compute_dtype=dtype)
            color, depth = K.assemble_image(tc, td, tiles_x=tiles_x,
                                            tiles_y=tiles_y, width=w, height=h)
            return color, depth
        return f

    args = (gi, view, proj, center)

    def t(fn):
        f = jax.jit(lambda *a: fn(*a)[0][0, 0, 0] + fn(*a)[1][-1, -1])
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

    outs = {}
    for dt in ('f32', 'bf16'):
        ms = t(frame(dt))
        print(f"compute_dtype={dt}: {ms:.2f} ms/frame", flush=True)
        c = np.asarray(jax.jit(frame(dt))(*args)[0])
        outs[dt] = c
    d = np.abs(outs['f32'] - outs['bf16'])
    print(f"on-chip bf16 vs f32: max {d.max():.5f} mean {d.mean():.6f}",
          flush=True)

main()
