"""Stereo (and optionally Local-4K) split-vs-fused A/B through the tunnel.

The mono 3-program split loses through the tunnel (~6 ms device win < 2x3 ms
dispatch round trips — scratch/splitab.py), so split_frame auto-selects
fused there.  But the composed-sort VOLUME law says the 10-operand stereo
sort pays ~24 ms composed vs ~7 split (BACKLOG), so stereo's device win
(~17 ms) should beat the tunnel tax.  This measures it.
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

    mode = sys.argv[1] if len(sys.argv) > 1 else "stereo"
    n = 1_000_000
    w, h = 1920, 1080
    ds = generate_visible_gaussians(n, sh_degree=3, scale_range=(0.002, 0.012))
    gi = ds.to_input()
    cam = G.make_camera(w, h, far=50.0)
    stereo = G.make_side_by_side_stereo(cam)

    if mode == "stereo":
        def mk(split):
            r = G.DepthFirstRenderer(G.RendererConfig(sh_degree=3))
            r.split_frame = split
            return r

        def render(r):
            return r.render_stereo(gi, stereo, w, h)
    elif mode == "local4k":
        w4, h4 = 3840, 2160

        def mk(split):
            r = G.LocalRenderer(G.RendererConfig(sh_degree=3))
            r.split_frame = split
            return r

        def render(r):
            return r.render(gi, cam, w4, h4)
    else:
        raise SystemExit(f"unknown mode {mode}")

    ra, rb = mk(True), mk(False)
    for r in (ra, rb):
        t0 = time.perf_counter()
        for _ in range(3):
            out = render(r)
        np.asarray(out.depth).ravel()[:1]
        print(f"split={r.split_frame}: warm in {time.perf_counter()-t0:.0f}s",
              flush=True)

    ca = np.asarray(render(ra).color)
    cb = np.asarray(render(rb).color)
    print(f"color bitwise equal: {np.array_equal(ca, cb)}  "
          f"max|d|: {np.abs(ca - cb).max():.3g}", flush=True)

    def chain6(r):
        t0 = time.perf_counter()
        for _ in range(6):
            out = render(r)
        np.asarray(out.depth).ravel()[:1]
        return (time.perf_counter() - t0) / 6 * 1000

    res = {True: [], False: []}
    for rep in range(6):
        for r in (ra, rb):
            res[r.split_frame].append(chain6(r))
    for k, xs in res.items():
        xs = sorted(xs)
        print(f"split={k}: median {xs[len(xs)//2]:6.2f}  min {xs[0]:6.2f}  "
              f"all {['%.1f' % x for x in xs]}", flush=True)


if __name__ == "__main__":
    main()
