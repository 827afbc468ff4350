"""Foveated rate-map RADIUS axis: the min_rate sweep (MATRIX_r05) is flat
because at radius=0.3 the rate-map integral (physical resolution) barely
changes (1767x994 -> 1703x958).  The radius controls how much of the display
is high-rate; a small fovea is what 'aggressive foveation' means in practice
(eye-tracked HMDs use ~10-20 deg fovea).  Appends rows to MATRIX_r05.json.
"""

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
OUT = os.path.join(ROOT, "MATRIX_r05.json")


def main():
    import bench
    bench._enable_compile_cache()
    import gsm_renderer_tpu as G
    from gsm_renderer_tpu.io.scene import generate_visible_gaussians
    from gsm_renderer_tpu.stereo import make_rate_maps

    results = json.load(open(OUT)) if os.path.exists(OUT) else {}
    w, h = 1920, 1080
    ds = generate_visible_gaussians(1_000_000, sh_degree=3,
                                    scale_range=(0.002, 0.012))
    cam = G.make_camera(w, h, far=50.0)
    stereo = G.make_side_by_side_stereo(cam)
    gi = ds.to_input()

    for radius, min_rate in ((0.15, 0.25), (0.1, 0.15)):
        key = (f"depthfirst_foveated_1m_sh3_rad{int(radius * 100):02d}"
               f"_r{int(min_rate * 100):02d}")
        if key in results:
            continue
        tgt = make_rate_maps(w, h, min_rate=min_rate, radius=radius)
        rf = G.DepthFirstRenderer(G.RendererConfig(sh_degree=3))
        fo = rf.render_stereo_foveated(gi, stereo, tgt)
        fo = rf.render_stereo_foveated(gi, stereo, tgt)
        stf = bench.time_frames(
            lambda: rf.render_stereo_foveated(gi, stereo, tgt))
        results[key] = dict(
            ms=round(stf["avg"], 3), min_rate=min_rate, radius=radius,
            physical=f"{tgt.render_width}x{tgt.render_height}x2",
            slot_total=int(fo.header.slot_total),
            overflow=int(fo.header.overflow))
        print(f"# {key}: {results[key]}", flush=True)
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1, sort_keys=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
