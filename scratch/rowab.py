"""Row-expand (per-row exact-span decomposition) A/B on the real chip.

Two workloads, ONE process, interleaved slope timing, bitwise checks:
  - headline: 1M SH3 1080p synthetic visible scene (friendly tail — expect
    ~neutral: few oversized rects, the row pass adds a ~1M-row kernel)
  - realistic: heavy-tailed PLY row (BASELINE depthfirst_1m_realistic_ply —
    2.29M of 7.07M slots were dead full-rect slots; expect a large win from
    the smaller locked capacity + less dead blend work)
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
    from gsm_renderer_tpu.io.scene import (generate_realistic_gaussians,
                                           generate_visible_gaussians)

    w, h = 1920, 1080

    def realistic():
        ply_path = os.path.join(tempfile.gettempdir(), "gsm_bench_real.ply")
        if not os.path.exists(ply_path):
            rds = generate_realistic_gaussians(1_000_000, sh_degree=3)
            write_ply(rds, ply_path)
        lds = load_ply(ply_path)
        view = np.eye(4, dtype=np.float32)
        view[2, 3] = -(lds.positions[:, 2].min() - 1.0)
        cam = G.make_camera(w, h, view_matrix=view, far=80.0)
        return lds.to_input(), cam

    def headline():
        ds = generate_visible_gaussians(1_000_000, sh_degree=3, seed=7)
        return ds.to_input(), G.make_camera(w, h)

    def build(gi, cam, rows):
        r = G.DepthFirstRenderer(G.RendererConfig(
            sh_degree=3, row_expand=rows))
        o = r.render(gi, cam, w, h)
        o = r.render(gi, cam, w, h)       # locked-capacity compile
        np.asarray(o.color[0, 0])
        return r, o

    def chain(r, gi, cam, k):
        t0 = time.perf_counter()
        out = None
        for _ in range(k):
            out = r.render(gi, cam, w, h)
        np.asarray(out.color[0, 0])
        return time.perf_counter() - t0

    for name, scene in (("headline", headline), ("realistic", realistic)):
        gi, cam = scene()
        rr, orow = build(gi, cam, True)
        rf, off = build(gi, cam, False)
        cr = np.asarray(orow.color)
        cf = np.asarray(off.color)
        caps = lambda r: [v["cap"] for k, v in (r._cap_state or {}).items()]
        print(f"{name}: bitwise {np.array_equal(cr, cf)} "
              f"slots rows={int(orow.header.slot_total)} "
              f"full={int(off.header.slot_total)} "
              f"row_total={int(orow.header.row_total)} "
              f"caps rows={caps(rr)} full={caps(rf)}", flush=True)
        k1, k2 = 3, 9
        for rep in range(3):
            tr1 = chain(rr, gi, cam, k1); tr2 = chain(rr, gi, cam, k2)
            tf1 = chain(rf, gi, cam, k1); tf2 = chain(rf, gi, cam, k2)
            pr = (tr2 - tr1) / (k2 - k1) * 1000
            pf = (tf2 - tf1) / (k2 - k1) * 1000
            print(f"  rep{rep}: rows {pr:.1f} ms  full {pf:.1f} ms "
                  f"(delta {pf - pr:+.1f})", flush=True)


if __name__ == "__main__":
    main()
