"""Bitwise parity A/B: fused Pallas projection kernel vs the XLA
project_and_cull + pack_record_words chain, plus timing.

Usage: python scratch/projab.py [cpu]  — cpu forces interpret mode.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    cpu = len(sys.argv) > 1 and sys.argv[1] == "cpu"
    import jax
    if cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.0)
    import jax.numpy as jnp

    import gsm_renderer_tpu as G
    from gsm_renderer_tpu import config as cfg
    from gsm_renderer_tpu.io.scene import generate_visible_gaussians
    from gsm_renderer_tpu.kernels.project import project_and_cull_packed
    from gsm_renderer_tpu.ops import binning as B
    from gsm_renderer_tpu.ops.project import project_and_cull
    from gsm_renderer_tpu.pipelines.common import pack_record_words
    from gsm_renderer_tpu.kernels.expand import CULLED_BIT

    n = 20_000 if cpu else 1_000_000
    w, h = 1920, 1080
    tiles_x, tiles_y = cfg.tiles_for(w, h, 16, 16)
    ds = generate_visible_gaussians(n, sh_degree=3, scale_range=(0.002, 0.012))
    cam = G.make_camera(w, h, far=50.0)
    gi = ds.to_input()
    view, proj, center = cam.astuple_jax()
    kw = dict(width=w, height=h, tile_w=16, tile_h=16, sh_degree=3,
              near_plane=0.1, far_plane=50.0, alpha_threshold=0.005,
              total_ink_threshold=2.0, input_is_srgb=False)
    plan = B.make_key_plan(tiles_x * tiles_y, n, near_plane=0.1,
                           far_plane=50.0)

    @jax.jit
    def xla_path(gi, view, proj, center):
        pr = project_and_cull(gi, view, proj, center, **kw)
        words = pack_record_words(pr.record)
        dsw = plan.normalize(pr.depth_key)
        rect_w = pr.max_tx - pr.min_tx + 1
        rw = B.pack_rect_word(pr.min_tx, pr.min_ty, rect_w)
        rw = jnp.where(pr.visible, rw, rw | jnp.uint32(CULLED_BIT))
        rect_h = pr.rect_count // jnp.maximum(rect_w, 1)
        return (rw, rect_h, dsw, words[:, 0], words[:, 1], words[:, 2],
                words[:, 3], pr.visible)

    @jax.jit
    def pallas_path(gi, view, proj, center):
        pp = project_and_cull_packed(gi, view, proj, center, key_plan=plan,
                                     interpret=cpu, **kw)
        return (pp.rect_word, pp.rect_h, pp.dsw, *pp.words, pp.visible)

    args = (gi, view, proj, center)
    rx = [np.asarray(x) for x in xla_path(*args)]
    rp = [np.asarray(x) for x in pallas_path(*args)]

    names = ["rect_word", "rect_h", "dsw", "w0", "w1", "w2", "w3", "visible"]
    vis = rx[7]
    print(f"visible: {vis.sum()}/{n}")
    ok_all = True
    for name, a, b in zip(names, rx, rp):
        eq_all = np.array_equal(a, b)
        eq_vis = np.array_equal(a[vis], b[vis]) if not eq_all else True
        if not eq_vis:
            idx = np.nonzero(a[vis] != b[vis])[0][:5]
            print(f"{name}: MISMATCH on visible rows {idx}; "
                  f"xla={a[vis][idx]}, pallas={b[vis][idx]}")
            ok_all = False
        else:
            note = "" if eq_all else " (culled rows differ — OK)"
            print(f"{name}: visible-bitexact{note}")
    # rect_h of culled rows: XLA path computes rect_count//rect_w = 0 when
    # culled; kernel forces 1 — both feed counts=max(...,1).  Check note only.
    print("PARITY:", "PASS" if ok_all else "FAIL")

    if cpu:
        return

    def t(f):
        np.asarray(f(*args)[0]).ravel()[:1]

        def chain(k):
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(k):
                    r = f(*args)
                np.asarray(r[0]).ravel()[:1]
                best = min(best, time.perf_counter() - t0)
            return best
        a, b = chain(2), chain(10)
        return (b - a) / 8 * 1000

    for rep in range(3):
        print(f"rep{rep}: xla {t(xla_path):5.2f} ms  pallas "
              f"{t(pallas_path):5.2f} ms", flush=True)


if __name__ == "__main__":
    main()
