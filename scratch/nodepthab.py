"""On-chip receipt for RendererConfig.depth_output=False (VERDICT r4 #6).

Two claims to verify on the real TPU:
  1. COLOR is bitwise identical with and without the depth plane (the
     interpret-mode test shows a 1-ULP CPU vectorization artifact on the
     (128,3) vs (128,4) contraction; the MXU's systolic accumulation order
     over the contracting dim is column-count independent, so on chip the
     frames should be bitexact).
  2. The blend saves measurable time: one fewer accumulator column, one
     fewer output plane, no depth assembly.

Headline config: 1M gaussians SH3 1080p, DepthFirst fused.
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

    w, h = 1920, 1080
    ds = generate_visible_gaussians(1_000_000, sh_degree=3, seed=7)
    gi = ds.to_input()
    cam = G.make_camera(w, h)

    def build(depth_output):
        r = G.DepthFirstRenderer(G.RendererConfig(
            sh_degree=3, depth_output=depth_output))
        o = r.render(gi, cam, w, h)
        o = r.render(gi, cam, w, h)       # locked-capacity compile
        np.asarray(o.color[0, 0])
        return r, o

    rd, od = build(True)
    rn, on = build(False)
    cd = np.asarray(od.color)
    cn = np.asarray(on.color)
    print("depth=None:", on.depth is None, flush=True)
    print("color bitwise identical:", np.array_equal(cd, cn), flush=True)
    if not np.array_equal(cd, cn):
        diff = np.abs(cd - cn)
        print("  max diff:", diff.max(), "n_diff:", (diff > 0).sum(),
              flush=True)

    def chain(r, k):
        t0 = time.perf_counter()
        out = None
        for _ in range(k):
            out = r.render(gi, cam, w, h)
        np.asarray(out.color[0, 0])
        return time.perf_counter() - t0

    k1, k2 = 4, 14
    for rep in range(3):
        td1 = chain(rd, k1); td2 = chain(rd, k2)
        tn1 = chain(rn, k1); tn2 = chain(rn, k2)
        pd = (td2 - td1) / (k2 - k1) * 1000
        pn = (tn2 - tn1) / (k2 - k1) * 1000
        print(f"rep{rep}: depth {pd:.2f} ms  no-depth {pn:.2f} ms "
              f"(delta {pd - pn:+.2f})", flush=True)


if __name__ == "__main__":
    main()
