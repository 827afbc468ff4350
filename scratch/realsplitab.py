"""Split-vs-fused A/B on the realistic heavy-tailed PLY row (VERDICT r4 #3).

At the headline (3.0M capacity) the 3-program split loses through the tunnel:
the composed-sort penalty is ~6 ms and two extra dispatches cost ~6 ms
(scratch/splitab.py).  The realistic row locks 7.6M capacity where the
composed sort is 36.5 ms (scratch/realprobe.py) vs ~11-12 own-program —
the split's win should dwarf the dispatch overhead.  Measure both, bitwise
parity-checked, interleaved in ONE process.
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

    import tempfile
    import gsm_renderer_tpu as G
    from gsm_renderer_tpu.io.ply import load_ply, write_ply
    from gsm_renderer_tpu.io.scene import generate_realistic_gaussians

    w, h = 1920, 1080
    ply_path = os.path.join(tempfile.gettempdir(), "gsm_bench_real.ply")
    if not os.path.exists(ply_path):
        rds = generate_realistic_gaussians(1_000_000, sh_degree=3)
        write_ply(rds, ply_path)
    lds = load_ply(ply_path)
    view = np.eye(4, dtype=np.float32)
    view[2, 3] = -(lds.positions[:, 2].min() - 1.0)
    cam = G.make_camera(w, h, view_matrix=view, far=80.0)
    gi = lds.to_input()

    def build(split):
        r = G.DepthFirstRenderer(G.RendererConfig(sh_degree=3))
        r.split_frame = split
        o = r.render(gi, cam, w, h)       # full-model frame
        o = r.render(gi, cam, w, h)       # locked-capacity compile
        np.asarray(o.color[0, 0])
        return r, o

    rf, of = build(False)
    rs, os_ = build(True)
    cf = np.asarray(of.color)
    cs = np.asarray(os_.color)
    print("bitwise identical:", np.array_equal(cf, cs), flush=True)
    for r, name in ((rf, "fused"), (rs, "split")):
        cap = [v["cap"] for v in (r._cap_state or {}).values()]
        print(f"  {name} locked capacity: {cap}", flush=True)

    def chain(r, k):
        t0 = time.perf_counter()
        out = None
        for _ in range(k):
            out = r.render(gi, cam, w, h)
        np.asarray(out.color[0, 0])
        return time.perf_counter() - t0

    # interleaved slope timing: per-frame = (t(k2)-t(k1))/(k2-k1)
    k1, k2 = 3, 9
    for rep in range(3):
        tf1 = chain(rf, k1); tf2 = chain(rf, k2)
        ts1 = chain(rs, k1); ts2 = chain(rs, k2)
        pf = (tf2 - tf1) / (k2 - k1) * 1000
        ps = (ts2 - ts1) / (k2 - k1) * 1000
        print(f"rep{rep}: fused {pf:.1f} ms  split {ps:.1f} ms "
              f"(chains f {tf1*1000:.0f}/{tf2*1000:.0f} "
              f"s {ts1*1000:.0f}/{ts2*1000:.0f})", flush=True)


if __name__ == "__main__":
    main()
