"""A/B DepthFirst tile shape (16x16 vs 32x16) under the current blend modes.

The round-2 receipt rejected SMALLER tiles (8x16/16x8: pixel-pair win eaten
by instance growth).  The MXU-exponent blend shrinks the per-pair cost, so
BIGGER tiles (fewer instances -> smaller sort/expand; more pairs -> cheaper
now) may have flipped sign.  Full-frame slope timing, interleaved reps.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

def main():
    import jax
    jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.0)
    import gsm_renderer_tpu as G
    from gsm_renderer_tpu.io.scene import generate_visible_gaussians
    from gsm_renderer_tpu.pipelines.depth_first import depth_first_frame

    n = 1_000_000
    w, h = 1920, 1080
    ds = generate_visible_gaussians(n, sh_degree=3, scale_range=(0.002, 0.012))
    cam = G.make_camera(w, h, far=50.0)
    gi = ds.to_input()
    view, proj, center = cam.astuple_jax()
    args = (gi, view, proj, center)

    def frame(tw, th, cap):
        import functools
        return jax.jit(functools.partial(
            depth_first_frame, width=w, height=h, capacity=cap, sh_degree=3,
            alpha_threshold=0.005, total_ink_threshold=2.0, near_plane=0.1,
            far_plane=50.0, input_is_srgb=False, tile_w=tw, tile_h=th))

    def slope(f):
        out = f(*args)
        total = int(out.header.slot_total)
        np.asarray(out.color)[:1]
        def chain(k):
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(k):
                    r = f(*args)
                np.asarray(r.color).ravel()[:1]
                best = min(best, time.perf_counter() - t0)
            return best
        t3, t6 = chain(3), chain(6)
        return (t6 - t3) / 3 * 1000, total

    # pass 1 at generous capacity to learn slot totals, then locked
    shapes = ((16, 16), (32, 16))
    caps = {}
    for tw, th in shapes:
        _, total = slope(frame(tw, th, -(-4 * n // 4096) * 4096))
        caps[(tw, th)] = -(-int(total * 1.04) // 4096) * 4096
        print(f"{tw}x{th}: slots {total} -> cap {caps[(tw, th)]}", flush=True)
    for rep in range(2):
        for tw, th in shapes:
            ms, _ = slope(frame(tw, th, caps[(tw, th)]))
            print(f"rep{rep} {tw}x{th}: {ms:.2f} ms", flush=True)

main()
