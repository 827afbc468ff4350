"""On-chip A/B of the opt-in foveated periphery LOD (RendererConfig.
foveated_lod): rate-scaled pruning of sub-sample splats in the periphery
(fovea exact).  Times the full render_stereo_foveated frame at lod 0 (off)
vs candidate thresholds, reports live-instance deltas (header.slot_total)
and the image delta split fovea/periphery.
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
    stereo = G.make_side_by_side_stereo(cam)
    gi = ds.to_input()
    from gsm_renderer_tpu.stereo import make_rate_maps
    tgt = make_rate_maps(w, h, min_rate=0.4, radius=0.3)

    lods = [0.0, 0.5, 1.0] if len(sys.argv) < 2 else \
        [float(x) for x in sys.argv[1].split(",")]

    rend = {}
    outs = {}
    for lod in lods:
        r = G.DepthFirstRenderer(G.RendererConfig(foveated_lod=lod))
        t0 = time.perf_counter()
        out = r.render_stereo_foveated(gi, stereo, tgt)
        col = np.asarray(out.color)
        print(f"lod {lod}: compiled+first in {time.perf_counter()-t0:.0f}s "
              f"slot_total={int(out.header.slot_total)} "
              f"overflow={int(out.header.overflow)}", flush=True)
        rend[lod] = r
        outs[lod] = col

    base = outs[lods[0]]
    rw = base.shape[1] // 2
    # fovea = central square of EACH eye's physical target (the rate map is
    # radial around the eye center; radius 0.3 of min dim is full-rate);
    # exactness is checked on both eyes' fovea regions (max over the two).
    rh = base.shape[0]
    cy = rh // 2
    rad = int(0.25 * min(rw, rh))
    for lod in lods[1:]:
        d = np.abs(outs[lod] - base)
        fov = max(
            d[cy - rad:cy + rad, cx - rad:cx + rad].max()
            for cx in (rw // 2, rw + rw // 2))
        print(f"lod {lod}: max|d| full={d.max():.4f} fovea={fov:.4f} "
              f"mean|d|={d.mean():.6f}", flush=True)

    def t(r):
        def chain(k):
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(k):
                    out = r.render_stereo_foveated(gi, stereo, tgt)
                np.asarray(out.depth).ravel()[:1]
                best = min(best, time.perf_counter() - t0)
            return best
        a, b = chain(2), chain(6)
        return (b - a) / 4 * 1000

    for rep in range(4):
        row = "  ".join(f"lod{lod} {t(rend[lod]):6.2f}" for lod in lods)
        print(f"rep{rep}: {row} ms", flush=True)


if __name__ == "__main__":
    main()
