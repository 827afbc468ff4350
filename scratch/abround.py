"""Consolidated full-frame A/Bs for the round's knob-gated changes:

  mono:    PLANE_MAJOR_TABLE on/off (headline config)
  stereo:  fused stereo prep on/off
  foveated: fused warped prep on/off

Interleaved reps through the public renderer API with adaptive-capacity
lock-in, slope-timed like bench.py.  Usage: python scratch/abround.py
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def main():
    import jax
    jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.0)
    import gsm_renderer_tpu as G
    import gsm_renderer_tpu.pipelines.common as C
    from gsm_renderer_tpu.kernels import blend as K
    from gsm_renderer_tpu.io.scene import generate_visible_gaussians
    from gsm_renderer_tpu.stereo import make_rate_maps

    ds = generate_visible_gaussians(1_000_000, sh_degree=3,
                                    scale_range=(0.002, 0.012))
    gi = ds.to_input()
    cam = G.make_camera(1920, 1080, far=50.0)
    stereo = G.make_side_by_side_stereo(cam)
    tgt = make_rate_maps(1920, 1080, min_rate=0.4, radius=0.3)

    orig_fbw = C.fused_binning_words

    def no_prep_fbw(*a, **k):
        k["use_prep"] = False
        return orig_fbw(*a, **k)

    def slope(fn):
        fn(); fn()                       # compile + capacity lock-in
        out = fn()
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])

        def chain(kk):
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(kk):
                    r = fn()
                np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[0])
                best = min(best, time.perf_counter() - t0)
            return best
        t3, t9 = chain(3), chain(9)
        return (t9 - t3) / 6 * 1000

    def mono(plane_major):
        K.PLANE_MAJOR_TABLE = plane_major
        r = G.DepthFirstRenderer(G.RendererConfig(sh_degree=3))
        return slope(lambda: r.render(gi, cam, 1920, 1080))

    def st(prep):
        C.fused_binning_words = orig_fbw if prep else no_prep_fbw
        try:
            r = G.DepthFirstRenderer(G.RendererConfig(sh_degree=3))
            return slope(lambda: r.render_stereo(gi, stereo, 1920, 1080))
        finally:
            C.fused_binning_words = orig_fbw

    def fov(prep):
        C.fused_binning_words = orig_fbw if prep else no_prep_fbw
        try:
            r = G.DepthFirstRenderer(G.RendererConfig(sh_degree=3))
            return slope(lambda: r.render_stereo_foveated(gi, stereo, tgt))
        finally:
            C.fused_binning_words = orig_fbw

    for rep in range(2):
        print(f"-- rep {rep}", flush=True)
        print(f"mono plane-major : {mono(True):.2f} ms", flush=True)
        print(f"mono interleaved : {mono(False):.2f} ms", flush=True)
        K.PLANE_MAJOR_TABLE = True
        print(f"stereo prep ON   : {st(True):.2f} ms", flush=True)
        print(f"stereo prep OFF  : {st(False):.2f} ms", flush=True)
        print(f"fov prep ON      : {fov(True):.2f} ms", flush=True)
        print(f"fov prep OFF     : {fov(False):.2f} ms", flush=True)


main()
