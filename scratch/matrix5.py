"""Incremental MATRIX_r05 runner: writes each row into MATRIX_r05.json AS IT
COMPLETES (cold-cache remote compiles can take minutes per program; an
all-or-nothing run risks losing everything to a wall-clock cut).

Priority order: headline (row_expand default-on validation), realistic-PLY
(VERDICT r4 #3: row_expand's target), foveated aggressive maps (VERDICT #5),
foveated gentle, stereo, global/local rows, stage split (VERDICT #7).
"""

import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
OUT = os.path.join(ROOT, "MATRIX_r05.json")


def save(results):
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
    print(f"## saved {list(results)}", flush=True)


def main():
    import bench
    bench._enable_compile_cache()
    import gsm_renderer_tpu as G
    from gsm_renderer_tpu.io.scene import (generate_realistic_gaussians,
                                           generate_visible_gaussians)

    results = {}
    if os.path.exists(OUT):
        results = json.load(open(OUT))

    w, h = 1920, 1080

    def put(name, row):
        results[name] = row
        print(f"# {name}: {row}", flush=True)
        save(results)

    # -- headline: depthfirst 1M SH3 1080p (row_expand default ON) --------
    ds = generate_visible_gaussians(1_000_000, sh_degree=3,
                                    scale_range=(0.002, 0.012))
    cam = G.make_camera(w, h, far=50.0)
    gi = ds.to_input()
    if "depthfirst_1m_1080p_sh3" not in results:
        r = G.DepthFirstRenderer(G.RendererConfig(sh_degree=3))
        t0 = time.perf_counter()
        out = r.render(gi, cam, w, h)
        out = r.render(gi, cam, w, h)  # capacity lock-in
        print(f"## headline compiled in {time.perf_counter()-t0:.0f}s",
              flush=True)
        st = bench.time_frames(lambda: r.render(gi, cam, w, h))
        locked = max((s["cap"] for s in (r._cap_state or {}).values()),
                     default=0)
        put("depthfirst_1m_1080p_sh3", dict(
            ms=round(st["avg"], 3), min=round(st["min"], 3),
            max=round(st["max"], 3), overflow=int(out.header.overflow),
            instances=int(out.header.total_instances),
            slot_total=int(out.header.slot_total),
            row_total=int(getattr(out.header, "row_total", 0) or 0),
            locked_capacity=int(locked),
            msplats_per_s=round(1_000_000 / st["avg"] / 1000.0, 1)))

    # -- realistic heavy-tailed PLY (VERDICT #3; row_expand's target) -----
    if "depthfirst_1m_realistic_ply" not in results:
        import tempfile
        from gsm_renderer_tpu.io.ply import load_ply, write_ply
        rds = generate_realistic_gaussians(1_000_000, sh_degree=3)
        ply_path = os.path.join(tempfile.gettempdir(), "gsm_bench_real.ply")
        write_ply(rds, ply_path)
        lds = load_ply(ply_path)
        view = np.eye(4, dtype=np.float32)
        view[2, 3] = -(lds.positions[:, 2].min() - 1.0)
        cam_r = G.make_camera(w, h, view_matrix=view, far=80.0)
        rr = G.DepthFirstRenderer(G.RendererConfig(sh_degree=3))
        gi_r = lds.to_input()
        t0 = time.perf_counter()
        o = rr.render(gi_r, cam_r, w, h)
        o = rr.render(gi_r, cam_r, w, h)  # capacity lock-in
        print(f"## realistic compiled in {time.perf_counter()-t0:.0f}s",
              flush=True)
        sr = bench.time_frames(lambda: rr.render(gi_r, cam_r, w, h))
        locked = max((s["cap"] for s in (rr._cap_state or {}).values()),
                     default=0)
        put("depthfirst_1m_realistic_ply", dict(
            ms=round(sr["avg"], 3), overflow=int(o.header.overflow),
            instances=int(o.header.total_instances),
            slot_total=int(o.header.slot_total),
            row_total=int(getattr(o.header, "row_total", 0) or 0),
            locked_capacity=int(locked)))

    # -- foveated rate-map sweep (VERDICT #5: aggressive maps first) ------
    from gsm_renderer_tpu.stereo import make_rate_maps
    stereo = G.make_side_by_side_stereo(cam)
    for min_rate in (0.15, 0.25, 0.4):
        key = ("depthfirst_foveated_1m_sh3" if min_rate == 0.4 else
               f"depthfirst_foveated_1m_sh3_r{int(min_rate * 100):02d}")
        if key in results:
            continue
        tgt = make_rate_maps(w, h, min_rate=min_rate, radius=0.3)
        rf = G.DepthFirstRenderer(G.RendererConfig(sh_degree=3))
        t0 = time.perf_counter()
        fo = rf.render_stereo_foveated(gi, stereo, tgt)
        fo = rf.render_stereo_foveated(gi, stereo, tgt)
        print(f"## foveated r{min_rate} compiled in "
              f"{time.perf_counter()-t0:.0f}s", flush=True)
        stf = bench.time_frames(
            lambda: rf.render_stereo_foveated(gi, stereo, tgt))
        put(key, dict(ms=round(stf["avg"], 3), min_rate=min_rate,
                      physical=f"{tgt.render_width}x{tgt.render_height}x2",
                      slot_total=int(fo.header.slot_total),
                      overflow=int(fo.header.overflow)))

    # -- stereo side-by-side ---------------------------------------------
    if "depthfirst_stereo_1m_1080p_sh3" not in results:
        r = G.DepthFirstRenderer(G.RendererConfig(sh_degree=3))
        out = r.render_stereo(gi, stereo, w, h)
        out = r.render_stereo(gi, stereo, w, h)
        st = bench.time_frames(lambda: r.render_stereo(gi, stereo, w, h))
        put("depthfirst_stereo_1m_1080p_sh3", dict(
            ms=round(st["avg"], 3), overflow=int(out.header.overflow)))

    # -- remaining BASELINE grid rows ------------------------------------
    grid = [
        ("global_50k_800x600_sh0", 50_000, 800, 600, 0, "global", None, 0),
        ("global_500k_1080p_sh2", 500_000, 1920, 1080, 2, "global", None, 0),
        ("local_1m_4k_fp16", 1_000_000, 3840, 2160, 0, "local",
         "fp16", 6_815_744),
    ]
    for name, n, gw, gh, sh, rend, prec, mi in grid:
        if name in results:
            continue
        precision = G.Precision.FLOAT16 if prec else None
        r, gg, gcam = bench._build(n, gw, gh, sh, (0.002, 0.012), rend,
                                   precision=precision)
        if mi:
            import dataclasses
            r.config = dataclasses.replace(r.config, max_instances=mi)
        out = r.render(gg, gcam, gw, gh)
        out = r.render(gg, gcam, gw, gh)
        st = bench.time_frames(lambda: r.render(gg, gcam, gw, gh))
        put(name, dict(ms=round(st["avg"], 3), min=round(st["min"], 3),
                       max=round(st["max"], 3),
                       overflow=int(out.header.overflow),
                       msplats_per_s=round(n / st["avg"] / 1000.0, 1)))

    # -- stage split at the HEADLINE's locked capacity (VERDICT #7) -------
    if "stage_split" not in results:
        from gsm_renderer_tpu.profiling import profile_depth_first_stages
        cap = results["depthfirst_1m_1080p_sh3"].get("locked_capacity", 0)
        split = {k: round(v, 2) for k, v in profile_depth_first_stages(
            gi, cam, w, h, sh_degree=3, capacity=cap or 4_000_000).items()}
        # NOTE: cut-point programs profile the full-rect expand path
        # (row_expand OFF); the fused headline with row_expand ON is the
        # "total" comparison target only if the headline scene has no
        # oversized rects.  row_total above says how much row work exists.
        split["note"] = ("full-rect path (row_expand off); raw deltas, "
                        "may be negative within ~0.3 ms slope noise")
        put("stage_split", split)

    print("ALL DONE", flush=True)


if __name__ == "__main__":
    main()
