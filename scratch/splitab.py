"""In-process A/B: 3-program split frame vs single-program frame through the
public DepthFirstRenderer at the headline config, chained-frame timing +
bitwise parity.  (The split's device-side win is ~6 ms — composed-sort
pathology receipts — but each frame pays 2 extra dispatches through the
tunnel; this measures the net.)
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
    from gsm_renderer_tpu.io.scene import generate_visible_gaussians

    n = 1_000_000
    w, h = 1920, 1080
    ds = generate_visible_gaussians(n, sh_degree=3, scale_range=(0.002, 0.012))
    cam = G.make_camera(w, h, far=50.0)
    gi = ds.to_input()

    def mk(split):
        r = G.DepthFirstRenderer(G.RendererConfig(sh_degree=3, max_width=w,
                                                  max_height=h))
        r.split_frame = split
        return r

    ra, rb = mk(True), mk(False)

    # warm both (several frames so adaptive capacity locks in on each)
    for r in (ra, rb):
        for _ in range(3):
            out = r.render(gi, cam, w, h)
        np.asarray(out.header.overflow)

    ca = np.asarray(ra.render(gi, cam, w, h).color)
    cb = np.asarray(rb.render(gi, cam, w, h).color)
    print(f"color bitwise equal: {np.array_equal(ca, cb)}  "
          f"max|d|: {np.abs(ca - cb).max():.3g}", flush=True)

    def t(r):
        def chain(k):
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(k):
                    out = r.render(gi, cam, w, h)
                np.asarray(out.depth).ravel()[:1]
                best = min(best, time.perf_counter() - t0)
            return best
        a, b = chain(2), chain(10)
        return (b - a) / 8 * 1000

    for rep in range(3):
        ta, tb = t(ra), t(rb)
        print(f"rep{rep}: split {ta:6.2f} ms   single {tb:6.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
