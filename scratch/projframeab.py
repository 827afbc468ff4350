"""In-process full-frame A/B: Pallas fused projection vs XLA projection,
interleaved slope-timed reps, bitwise output check.  (Cross-process bench
comparisons drift +-2-3 ms through the tunnel — A/B within ONE process.)"""
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
    from gsm_renderer_tpu.io.scene import generate_visible_gaussians
    from gsm_renderer_tpu.pipelines.depth_first import depth_first_frame

    n = 1_000_000
    w, h = 1920, 1080
    cap = 3_002_368
    ds = generate_visible_gaussians(n, sh_degree=3, scale_range=(0.002, 0.012))
    cam = G.make_camera(w, h, far=50.0)
    gi = ds.to_input()
    view, proj, center = cam.astuple_jax()
    statics = dict(width=w, height=h, capacity=cap, sh_degree=3,
                   alpha_threshold=0.005, total_ink_threshold=2.0,
                   near_plane=0.1, far_plane=50.0, input_is_srgb=False)

    from gsm_renderer_tpu.kernels.project import cached_projection_inputs
    prep = cached_projection_inputs(gi, 3)

    fa_ = jax.jit(lambda g, v, p, c, co, ha: depth_first_frame(
        g, v, p, c, co, ha, pallas_project=True, **statics))
    fb_ = jax.jit(lambda *a: depth_first_frame(*a, pallas_project=False,
                                               **statics))
    args = (gi, view, proj, center)

    def fa(*a):
        return fa_(*a, *prep)

    def fb(*a):
        return fb_(*a)

    oa, ob = fa(*args), fb(*args)
    ca, cb = np.asarray(oa.color), np.asarray(ob.color)
    da, db = np.asarray(oa.depth), np.asarray(ob.depth)
    print("color bitexact:", np.array_equal(ca, cb),
          " depth bitexact:", np.array_equal(da, db),
          " slot_total:", int(oa.header.slot_total),
          int(ob.header.slot_total),
          " visible:", int(oa.header.visible_count),
          int(ob.header.visible_count), flush=True)

    def t(f):
        def chain(k):
            best = 1e9
            for _ in range(4):
                t0 = time.perf_counter()
                for _ in range(k):
                    r = f(*args)
                np.asarray(r.depth).ravel()[:1]
                best = min(best, time.perf_counter() - t0)
            return best
        a, b = chain(3), chain(13)
        return (b - a) / 10 * 1000

    for rep in range(4):
        print(f"rep{rep}: pallas-proj {t(fa):6.2f}  xla-proj {t(fb):6.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
