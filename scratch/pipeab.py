"""Cross-frame dispatch pipelining A/B (VERDICT r4 item 2).

The 3-program split frame (pre | bare sort | post) is ~6 ms faster
device-side but loses through the axon tunnel: each execution carries
~1.5-3 ms of service/device overhead that serializes with device work
(scratch/dispatchprobe.py).  Two attacks measured here at the headline
config (1M SH3 1080p, locked adaptive capacity), all bitwise-checked:

  A. fused     — single program per frame (current tunnel default)
  B. split3    — pre | sort | post (current local-TPU default)
  C. reorder   — split3 with pre(f+1) enqueued BEFORE post(f) (the judge's
                 literal probe; dispatch is already async so this should be
                 a no-op, receipt either way)
  D. postpre   — CROSS-FRAME FUSION: post(f-1)+pre(f) compiled as ONE
                 program, so the steady-state frame is 2 dispatches
                 (sort | postpre) instead of 3, and the non-sort stages
                 share one program's fusion scope.  One frame of latency
                 (the image returned is the previous submit's) — the
                 reference's own command-buffer model runs frames in
                 flight the same way (render() encodes, commit is async).
  E. postpre + donated sort operands (does donation cut the per-execution
                 overhead? the sort moves 6 x 12 MB in + out).
"""
import functools
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
    from gsm_renderer_tpu.pipelines import depth_first as DF
    from gsm_renderer_tpu import config as cfg

    n = 1_000_000
    w, h = 1920, 1080
    ds = generate_visible_gaussians(n, sh_degree=3, scale_range=(0.002, 0.012))
    cam = G.make_camera(w, h, far=50.0)
    gi = ds.to_input()
    view, proj, center = cam.astuple_jax()

    # lock adaptive capacity exactly like bench.py
    r = G.DepthFirstRenderer(G.RendererConfig(sh_degree=3))
    r.split_frame = False
    for _ in range(2):
        out = r.render(gi, cam, w, h)
    np.asarray(out.header.overflow)
    capacity = r._cap_state[("df", n)]["cap"]
    print(f"locked capacity: {capacity}", flush=True)

    statics = dict(
        width=w, height=h, capacity=capacity, sh_degree=3,
        alpha_threshold=cfg.DEFAULT_ALPHA_THRESHOLD,
        total_ink_threshold=cfg.DEFAULT_TOTAL_INK_THRESHOLD,
        near_plane=cam.near_plane, far_plane=cam.far_plane,
        input_is_srgb=False, tile_w=16, tile_h=16,
        exact_tile_test=True, back_to_front=False,
        depth_key_bits=32, tile_id_bits=16,
    )
    pre_statics = dict(statics)
    post_keys = ("width", "height", "capacity", "alpha_threshold",
                 "near_plane", "far_plane", "tile_w", "tile_h",
                 "depth_key_bits", "tile_id_bits")
    post_statics = {k: statics[k] for k in post_keys}
    post_statics["n_gaussians"] = n

    from gsm_renderer_tpu.kernels.project import cached_projection_inputs
    prep = cached_projection_inputs(gi, 3)

    fused = jax.jit(functools.partial(DF.depth_first_frame, **statics))
    pre = jax.jit(functools.partial(DF.depth_first_pre_frame, **pre_statics))
    sortp = jax.jit(functools.partial(DF.sort_frame, num_keys=2,
                                      is_stable=False))
    sortp_don = jax.jit(functools.partial(DF.sort_frame, num_keys=2,
                                          is_stable=False),
                        donate_argnums=tuple(range(6)))
    post = jax.jit(functools.partial(DF.depth_first_post_frame,
                                     **post_statics))

    def postpre_frame(sorted_key, w0, w1, w2, w3, slot_total, overflow,
                      visible_count, gi, view, proj, center, comp, harm):
        out = DF.depth_first_post_frame(sorted_key, w0, w1, w2, w3,
                                        slot_total, overflow, visible_count,
                                        **post_statics)
        ops = DF.depth_first_pre_frame(gi, view, proj, center, comp, harm,
                                       **pre_statics)
        return out, ops

    postpre = jax.jit(postpre_frame)

    # ---- warm all programs + bitwise parity --------------------------------
    out_f = fused(gi, view, proj, center, *prep)
    cf = np.asarray(out_f.color)

    state = pre(gi, view, proj, center, *prep)

    def split3_frame(state):
        sort_in, hdrs = state[:-3], state[-3:]
        s = sortp(*sort_in)
        return post(s[0], *s[2:], *hdrs)

    out_s = split3_frame(state)
    cs = np.asarray(out_s.color)
    print(f"split3 vs fused bitwise: {np.array_equal(cf, cs)}", flush=True)

    s = sortp(*state[:-3])
    out_pp, state2 = postpre(s[0], *s[2:], *state[-3:],
                             gi, view, proj, center, *prep)
    cpp = np.asarray(out_pp.color)
    print(f"postpre vs fused bitwise: {np.array_equal(cf, cpp)}", flush=True)

    # ---- timing -------------------------------------------------------------
    def slope(run_frames, reps=5):
        """run_frames(k) must submit k frames and return a device scalar-ish
        array to fetch.  Min-of-reps chains at two lengths; slope cancels the
        sync cost.  Prints raw chain times so stalls are visible."""
        ka, kb = 3, 13
        ta, tb = [], []
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(run_frames(ka)).ravel()[:1]
            ta.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            np.asarray(run_frames(kb)).ravel()[:1]
            tb.append(time.perf_counter() - t0)
        per = (min(tb) - min(ta)) / (kb - ka) * 1000
        raw = " ".join(f"{a*1000:.0f}/{b*1000:.0f}" for a, b in zip(ta, tb))
        print(f"    raw ms (k{ka}/k{kb}): {raw}", flush=True)
        return per

    def run_fused(k):
        for _ in range(k):
            out = fused(gi, view, proj, center, *prep)
        return out.color

    def run_split3(k):
        for _ in range(k):
            st = pre(gi, view, proj, center, *prep)
            s = sortp(*st[:-3])
            out = post(s[0], *s[2:], *st[-3:])
        return out.color

    def run_reorder(k):
        # pre(f+1) enqueued BEFORE post(f)
        st = pre(gi, view, proj, center, *prep)
        s = sortp(*st[:-3])
        hdrs = st[-3:]
        for _ in range(k - 1):
            st2 = pre(gi, view, proj, center, *prep)   # next frame's pre first
            out = post(s[0], *s[2:], *hdrs)            # then this frame's post
            s = sortp(*st2[:-3])
            hdrs = st2[-3:]
        out = post(s[0], *s[2:], *hdrs)
        return out.color

    def run_postpre(k):
        st = pre(gi, view, proj, center, *prep)
        s = sortp(*st[:-3])
        hdrs = st[-3:]
        for _ in range(k):
            out, st = postpre(s[0], *s[2:], *hdrs,
                              gi, view, proj, center, *prep)
            s = sortp(*st[:-3])
            hdrs = st[-3:]
        return out.color

    def run_postpre_don(k):
        st = pre(gi, view, proj, center, *prep)
        s = sortp_don(*st[:-3])
        hdrs = st[-3:]
        for _ in range(k):
            out, st = postpre(s[0], *s[2:], *hdrs,
                              gi, view, proj, center, *prep)
            s = sortp_don(*st[:-3])
            hdrs = st[-3:]
        return out.color

    variants = [("fused", run_fused), ("split3", run_split3),
                ("reorder", run_reorder), ("postpre", run_postpre),
                ("postpre_don", run_postpre_don)]
    # warm every variant once (compiles)
    for name, fn in variants:
        np.asarray(fn(2)).ravel()[:1]
        print(f"warmed {name}", flush=True)

    for rep in range(2):
        for name, fn in variants:
            print(f"  {name}:", flush=True)
            s = slope(fn)
            print(f"rep{rep} {name}: {s:6.2f} ms/frame", flush=True)


if __name__ == "__main__":
    main()
