"""Benchmark harness.

Mirrors the reference benchmark protocol (PLYBenchmarkTests.swift:200-298 /
TestUtils.swift:352-401): 3 warmup + 10 measured frames, avg/min/max ms, FPS,
M splats/s.  The headline metric (BASELINE.json) is ms/frame for the DepthFirst
pipeline at 1M gaussians, SH3, 1920x1080 on one chip; ``vs_baseline`` is the
speed ratio against the 16.6 ms (60 FPS) north-star target (>1 = faster than
target).

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": "ms", "vs_baseline": ...}

Timing note: on the tunneled device backend block_until_ready does not reliably
block, and a host fetch costs 35-60 ms; frames are therefore timed in chained
batches with a single scalar fetch at the end, divided by the batch size.
"""

import argparse
import json
import os
import sys
import time

import numpy as np


def _enable_compile_cache():
    """Persistent compilation cache: remote (tunneled) compiles take 20-300 s;
    caching makes repeated bench/profiling runs start in seconds."""
    try:
        import jax
        cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

TARGET_MS = 16.6


def _build(n, w, h, sh_degree, scale_range, renderer="depth_first", seed=7,
           precision=None):
    import gsm_renderer_tpu as G
    from gsm_renderer_tpu.io.scene import generate_visible_gaussians

    ds = generate_visible_gaussians(n, sh_degree=sh_degree, seed=seed,
                                    scale_range=scale_range)
    cam = G.make_camera(w, h, far=50.0)
    precision = precision or G.Precision.FLOAT32
    cfg = G.RendererConfig(sh_degree=sh_degree, precision=precision,
                           max_width=w, max_height=h)
    cls = {"depth_first": G.DepthFirstRenderer, "global": G.GlobalRenderer,
           "local": G.LocalRenderer, "hardware": G.HardwareRenderer}
    r = cls[renderer](cfg)
    return r, ds.to_input(precision), cam


def time_frames(render_fn, warmup=3, iters=10, reps=3):
    """Reference protocol: warmup then measure; returns per-frame ms stats.

    Per-sync dispatch+fetch overhead through the tunnel varies 25-45 ms
    BETWEEN sessions, so estimating it separately injects +-1.5 ms of jitter
    into the reported value.  Instead, time chains of two lengths with one
    sync each and take the SLOPE — the sync cost cancels exactly.

    Stats honesty (the reference protocol reports avg/min/max of 10 measured
    frames, TestUtils.swift:352-401; a slope estimator has no per-frame
    samples): ``avg`` is the slope of the BEST chain times (the headline
    value, robust to one-off stalls), ``min``/``max`` are the min/max of the
    per-repetition slope samples — the honest spread of the estimator itself
    — and ``chain_mean`` is the best long-chain mean (includes the one
    dispatch+fetch sync, so it upper-bounds a single-frame wall time).
    """
    import jax

    for _ in range(warmup):
        out = render_fn()
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])  # sync

    def chain(k):
        t0 = time.perf_counter()
        for _ in range(k):
            out = render_fn()
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        return time.perf_counter() - t0

    short, long_ = max(iters // 3, 2), max(2 * (iters // 3), 4)
    slopes, t_s_all, t_l_all = [], [], []
    for _ in range(reps):
        t_s = chain(short)
        t_l = chain(long_)
        t_s_all.append(t_s)
        t_l_all.append(t_l)
        slopes.append((t_l - t_s) / (long_ - short) * 1000)
    best = (min(t_l_all) - min(t_s_all)) / (long_ - short) * 1000
    return dict(avg=float(best), min=float(min(slopes)),
                max=float(max(slopes)),
                chain_mean=float(min(t_l_all) / long_ * 1000))


def measure_overhead():
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: x + 1)
    x = jnp.zeros(())
    np.asarray(f(x))
    t0 = time.perf_counter()
    k = 10
    for _ in range(k):
        np.asarray(f(x))
    return (time.perf_counter() - t0) / k * 1000


def main():
    _enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--gaussians", type=int, default=1_000_000)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--sh", type=int, default=3)
    ap.add_argument("--renderer", default="depth_first")
    ap.add_argument("--matrix", action="store_true",
                    help="run the full BASELINE.json config matrix")
    ap.add_argument("--stages", action="store_true",
                    help="also measure the per-stage (project/sort/blend) split")
    args = ap.parse_args()

    overhead_ms = measure_overhead()

    def run_one(n, w, h, sh, renderer, scale_range=(0.002, 0.012),
                precision=None, max_instances=0):
        r, gi, cam = _build(n, w, h, sh, scale_range, renderer,
                            precision=precision)
        # Default: adaptive capacity, starting from the reference's 4x model
        # (DepthFirstResources.swift:80-81) then locking to the measured
        # workload — the static-shape analogue of the reference sorting only
        # totalInstances via GPU indirect dispatch.  ``max_instances``
        # overrides (rows whose workload exceeds the 4x model).
        if max_instances:
            import dataclasses
            r.config = dataclasses.replace(r.config,
                                           max_instances=max_instances)
        out = r.render(gi, cam, w, h)   # compile at the full model
        out = r.render(gi, cam, w, h)   # capacity lock-in (+ compile)
        ov = int(out.header.overflow)
        stats = time_frames(lambda: r.render(gi, cam, w, h))
        frame_ms = max(stats["avg"], 0.01)
        locked = 0
        for state in (r._cap_state or {}).values():
            locked = max(locked, state["cap"])
        return frame_ms, stats, ov, int(out.header.total_instances), locked

    results = {}
    if args.matrix:
        matrix = [
            ("global_50k_800x600_sh0", 50_000, 800, 600, 0, "global"),
            ("global_500k_1080p_sh2", 500_000, 1920, 1080, 2, "global"),
            ("depthfirst_1m_1080p_sh3", 1_000_000, 1920, 1080, 3, "depth_first"),
            ("local_1m_4k_fp16", 1_000_000, 3840, 2160, 0, "local"),
        ]
        for name, n, w, h, sh, rend in matrix:
            import gsm_renderer_tpu as G
            prec = G.Precision.FLOAT16 if "fp16" in name else None
            # 4K quadruples the per-gaussian tile footprint past the 4x
            # model; size that row explicitly (reference behavior at 4x
            # would be overflow + instance drops)
            mi = 6_815_744 if "4k" in name else 0
            ms, stats, ov, ti, _lk = run_one(n, w, h, sh, rend,
                                             precision=prec,
                                             max_instances=mi)
            results[name] = dict(ms=round(ms, 3), min=round(stats["min"], 3),
                                 max=round(stats["max"], 3), overflow=ov,
                                 instances=ti,
                                 msplats_per_s=round(n / ms / 1000.0, 1))
            print(f"# {name}: {results[name]}", file=sys.stderr)

        # stereo side-by-side (BASELINE.md config 5)
        import gsm_renderer_tpu as G
        from gsm_renderer_tpu.io.scene import generate_visible_gaussians
        ds = generate_visible_gaussians(1_000_000, sh_degree=3,
                                        scale_range=(0.002, 0.012))
        cam = G.make_camera(1920, 1080, far=50.0)
        stereo = G.make_side_by_side_stereo(cam)
        r = G.DepthFirstRenderer(G.RendererConfig(sh_degree=3))
        gi = ds.to_input()
        out = r.render_stereo(gi, stereo, 1920, 1080)
        out = r.render_stereo(gi, stereo, 1920, 1080)  # capacity lock-in
        st = time_frames(lambda: r.render_stereo(gi, stereo, 1920, 1080))
        results["depthfirst_stereo_1m_1080p_sh3"] = dict(
            ms=round(st["avg"], 3),
            overflow=int(out.header.overflow))
        print(f"# stereo: {results['depthfirst_stereo_1m_1080p_sh3']}",
              file=sys.stderr)

        # foveated stereo (rasterization-rate-map equivalent): shades ONLY
        # physical pixels; per-gaussian polynomial inverse-warp re-binning
        # keeps instance counts within ~4% of full-res stereo (measured
        # 105 ms vs 104 ms full-res at this gentle map; aggressive maps
        # render less and win).
        from gsm_renderer_tpu.stereo import make_rate_maps
        # min_rate sweep: 0.4 is the gentle map (85% of full-res pixels);
        # 0.25/0.15 are the aggressive maps where the rate-map design is
        # supposed to win (fewer pixels AND fewer instances) — the claim in
        # pipelines/depth_first.py:1044-1057, now driver-visible.
        for min_rate in (0.4, 0.25, 0.15):
            tgt = make_rate_maps(1920, 1080, min_rate=min_rate, radius=0.3)
            rf = G.DepthFirstRenderer(G.RendererConfig(sh_degree=3))
            fo = rf.render_stereo_foveated(gi, stereo, tgt)
            fo = rf.render_stereo_foveated(gi, stereo, tgt)  # capacity lock-in
            stf = time_frames(
                lambda: rf.render_stereo_foveated(gi, stereo, tgt))
            key = ("depthfirst_foveated_1m_sh3" if min_rate == 0.4 else
                   f"depthfirst_foveated_1m_sh3_r{int(min_rate * 100):02d}")
            results[key] = dict(
                ms=round(stf["avg"], 3), min_rate=min_rate,
                physical=f"{tgt.render_width}x{tgt.render_height}x2",
                overflow=int(fo.header.overflow))
            print(f"# foveated: {results[key]}", file=sys.stderr)

        # realistic heavy-tailed scene THROUGH the PLY loader (the reference
        # harness benches a real ~1M garden PLY — PLYBenchmarkTests.swift:
        # 135-202; no network here, so the distribution is synthesized:
        # surface-clustered, log-normal scales, bimodal opacity, Morton order)
        import tempfile
        from gsm_renderer_tpu.io.ply import load_ply, write_ply
        from gsm_renderer_tpu.io.scene import generate_realistic_gaussians
        rds = generate_realistic_gaussians(1_000_000, sh_degree=3)
        ply_path = os.path.join(tempfile.gettempdir(), "gsm_bench_real.ply")
        write_ply(rds, ply_path)
        lds = load_ply(ply_path)  # recenters like the reference loader
        # camera just before the nearest splats, looking +z into the scene
        view = np.eye(4, dtype=np.float32)
        view[2, 3] = -(lds.positions[:, 2].min() - 1.0)
        cam_r = G.make_camera(1920, 1080, view_matrix=view, far=80.0)
        rr = G.DepthFirstRenderer(G.RendererConfig(sh_degree=3))
        gi_r = lds.to_input()
        o = rr.render(gi_r, cam_r, 1920, 1080)
        o = rr.render(gi_r, cam_r, 1920, 1080)  # capacity lock-in
        sr = time_frames(lambda: rr.render(gi_r, cam_r, 1920, 1080))
        results["depthfirst_1m_realistic_ply"] = dict(
            ms=round(sr["avg"], 3), overflow=int(o.header.overflow),
            instances=int(o.header.total_instances),
            slot_total=int(o.header.slot_total))
        print(f"# realistic ply: {results['depthfirst_1m_realistic_ply']}",
              file=sys.stderr)

    ms, stats, ov, ti, locked_cap = run_one(args.gaussians, args.width,
                                            args.height, args.sh,
                                            args.renderer)

    stage_split = None
    if args.stages:
        # profile at the ADAPTIVELY LOCKED capacity the headline frames ran
        # with (the sort is element-count-bound; profiling at the unlocked
        # 4x model would overstate it ~50%)
        import gsm_renderer_tpu as G
        from gsm_renderer_tpu.io.scene import generate_visible_gaussians
        from gsm_renderer_tpu.profiling import profile_depth_first_stages
        ds = generate_visible_gaussians(args.gaussians, sh_degree=args.sh,
                                        scale_range=(0.002, 0.012))
        cam = G.make_camera(args.width, args.height, far=50.0)
        stage_split = {k: round(v, 2) for k, v in profile_depth_first_stages(
            ds.to_input(), cam, args.width, args.height, sh_degree=args.sh,
            capacity=locked_cap or 4 * args.gaussians).items()}
        print(f"# stages: {stage_split}", file=sys.stderr)
    fps = 1000.0 / ms
    line = {
        "metric": f"ms/frame DepthFirst {args.gaussians//1000}k gaussians "
                  f"SH{args.sh} {args.width}x{args.height} (1 chip)",
        "value": round(ms, 3),
        "unit": "ms",
        "vs_baseline": round(TARGET_MS / ms, 4),
        "fps": round(fps, 2),
        "msplats_per_s": round(args.gaussians / ms / 1000.0, 1),
        "instances": ti,
        "overflow": ov,
        "sync_overhead_ms": round(overhead_ms, 3),
        "extra": results,
    }
    if stage_split is not None:
        line["stage_split_ms"] = stage_split
    print(json.dumps(line))


if __name__ == "__main__":
    main()
