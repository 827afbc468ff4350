"""Receipt probe for the mesh/instanced Hardware backend distinction.

VERDICT r4 missing #2: the reference's two Hardware draw pipelines (object/
mesh shaders, HardwareGaussianShaders.metal:782-1112, vs instanced quads +
imageblock resolve, :415-526) draw the SAME sorted splats and differ only in
submission granularity; their outputs are identical.  The TPU analogue of
submission granularity is the blend kernel's DMA chunk size: MESH_SHADERS
streams 512-instance chunks (blocks_per_dma=4), INSTANCED 1024 (=8, the
reference's splats-per-instance, :631-682).

This probe proves on-chip that (a) the two backends produce BITWISE identical
frames (like the reference), and (b) the granularity distinction carries a
measurable performance semantic — the only semantic the reference distinction
carries for output.  Run on the real chip; slope-timed chained frames.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    import gsm_renderer_tpu as G
    from gsm_renderer_tpu import config as cfg
    from gsm_renderer_tpu.io.scene import generate_visible_gaussians

    n, w, h = 300_000, 1920, 1080
    ds = generate_visible_gaussians(n, sh_degree=3,
                                    scale_range=(0.002, 0.012))
    cam = G.make_camera(w, h, far=50.0)
    gi = ds.to_input()

    def build(backend):
        r = G.HardwareRenderer(G.RendererConfig(
            sh_degree=3, hardware_backend=backend))
        out = r.render(gi, cam, w, h)
        out = r.render(gi, cam, w, h)  # capacity lock-in
        return r, out

    rm, om = build(cfg.HardwareBackend.MESH_SHADERS)
    ri, oi = build(cfg.HardwareBackend.INSTANCED)
    cm, ci = np.asarray(om.color), np.asarray(oi.color)
    print(f"bitwise identical: {np.array_equal(cm, ci)} "
          f"instances={int(om.header.total_instances)}", flush=True)

    def chain(r, k):
        t0 = time.perf_counter()
        for _ in range(k):
            out = r.render(gi, cam, w, h)
        np.asarray(out.color[0, 0])
        return time.perf_counter() - t0

    k1, k2 = 3, 9
    for rep in range(3):
        tm = (chain(rm, k2) - chain(rm, k1)) / (k2 - k1) * 1000
        ti = (chain(ri, k2) - chain(ri, k1)) / (k2 - k1) * 1000
        print(f"rep{rep}: mesh(512-chunk) {tm:.1f} ms  "
              f"instanced(1024-chunk) {ti:.1f} ms (delta {ti - tm:+.1f})",
              flush=True)


if __name__ == "__main__":
    main()
