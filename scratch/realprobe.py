"""Realistic heavy-tailed PLY workload probe (VERDICT r4 item 3).

1. Reproduce bench.py's realistic-PLY row (write+load PLY, recentered,
   camera at min-z - 1), lock the adaptive capacity, report header stats.
2. Cut-point stage split at the locked capacity (profiling.py).
3. Slot accounting from the projection outputs: how many slots come from
   exact-pre-counted (<=8x4 mask) gaussians vs full-rect fallbacks, the
   live/dead ratio of the fallback slots, and the rect-dimension CDF of the
   fallback population — i.e. how much sort volume a 8x8 / 16x8 / 16x16
   pre-count window would remove.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.0)

    import tempfile
    import gsm_renderer_tpu as G
    from gsm_renderer_tpu.io.ply import load_ply, write_ply
    from gsm_renderer_tpu.io.scene import generate_realistic_gaussians

    w, h = 1920, 1080
    rds = generate_realistic_gaussians(1_000_000, sh_degree=3)
    ply_path = os.path.join(tempfile.gettempdir(), "gsm_bench_real.ply")
    if not os.path.exists(ply_path):
        write_ply(rds, ply_path)
    lds = load_ply(ply_path)
    view = np.eye(4, dtype=np.float32)
    view[2, 3] = -(lds.positions[:, 2].min() - 1.0)
    cam = G.make_camera(w, h, view_matrix=view, far=80.0)
    gi = lds.to_input()

    r = G.DepthFirstRenderer(G.RendererConfig(sh_degree=3))
    o = r.render(gi, cam, w, h)
    o = r.render(gi, cam, w, h)
    print("visible", int(o.header.visible_count),
          "instances", int(o.header.total_instances),
          "slot_total", int(o.header.slot_total),
          "overflow", int(o.header.overflow), flush=True)
    cap = None
    for k, v in r._cap_state.items():
        cap = v["cap"]
    print("locked capacity:", cap, flush=True)

    # ---- slot accounting ---------------------------------------------------
    from gsm_renderer_tpu.ops.project import project_and_cull
    from gsm_renderer_tpu.pipelines.common import pack_record_words
    from gsm_renderer_tpu.kernels import expand as E
    vv, pp, cc = cam.astuple_jax()

    @jax.jit
    def acct(gi, vv, pp, cc):
        pr = project_and_cull(
            gi, vv, pp, cc, width=w, height=h, tile_w=16, tile_h=16,
            sh_degree=3, near_plane=cam.near_plane, far_plane=cam.far_plane,
            alpha_threshold=0.005, total_ink_threshold=2.0,
            input_is_srgb=False)
        words = pack_record_words(pr.record)
        rect_w = pr.max_tx - pr.min_tx + 1
        rect_h = pr.max_ty - pr.min_ty + 1
        mask, cnt = E.exact_tile_masks(
            words[:, 0], words[:, 1], words[:, 2], words[:, 3],
            pr.min_tx, pr.min_ty, rect_w, rect_h, 16, 16, 0.005)
        return pr.visible, rect_w, rect_h, cnt

    visible, rect_w, rect_h, cnt = (np.asarray(x)
                                    for x in acct(gi, vv, pp, cc))
    area = (rect_w * rect_h).astype(np.int64)
    elig = visible & (rect_w <= 8) & (rect_h <= 4)
    inel = visible & ~elig
    n_vis = int(visible.sum())
    live_elig = int(cnt[elig].sum())
    slots_elig = live_elig  # pre-counted exactly
    slots_inel = int(area[inel].sum())
    total_inst = int(o.header.total_instances)
    live_inel = total_inst - live_elig
    print(f"visible {n_vis}: eligible(<=8x4) {int(elig.sum())} "
          f"-> {slots_elig} slots (all live)", flush=True)
    print(f"  fallback {int(inel.sum())} -> {slots_inel} full-rect slots, "
          f"of which live ~{live_inel} "
          f"({100.0 * live_inel / max(slots_inel, 1):.1f}%)", flush=True)
    print(f"  sentinel (invisible) slots: {int((~visible).sum())}",
          flush=True)

    # what larger pre-count windows would capture (slots they'd move from
    # full-rect to exact; their live fraction stays the same ~ live_inel
    # ratio, so saved slots ~= captured_area * (1 - live_ratio))
    for mw, mh in ((8, 8), (16, 4), (16, 8), (16, 16), (32, 8), (32, 32)):
        cap_m = inel & (rect_w <= mw) & (rect_h <= mh)
        print(f"  window {mw}x{mh}: captures {int(cap_m.sum())} gaussians, "
              f"{int(area[cap_m].sum())} full-rect slots", flush=True)
    # rect dimension tail
    for q in (50, 90, 99, 99.9, 100):
        print(f"  inel rect dims p{q}: w={np.percentile(rect_w[inel], q):.0f}"
              f" h={np.percentile(rect_h[inel], q):.0f}", flush=True)

    # ---- stage split at the locked capacity --------------------------------
    from gsm_renderer_tpu.profiling import profile_depth_first_stages
    split = profile_depth_first_stages(gi, cam, w, h, sh_degree=3,
                                       capacity=cap)
    print("stage split:", {k: round(v, 2) for k, v in split.items()},
          flush=True)


if __name__ == "__main__":
    main()
