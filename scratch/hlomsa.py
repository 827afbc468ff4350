"""Fetch the optimized HLO of the fused headline frame (terminal-side compile,
HumanReadableProgramText sidechannel) and report which buffers carry S(1)
(alternate-memory/VMEM) layouts in the neighborhood of the instance sort —
the composed-sort poisoning mechanism (BACKLOG).  Also fingerprints the
program under candidate compiler options to verify an option actually
changed the compile (an unparsed textproto silently no-ops).
"""
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build():
    import jax
    jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.0)

    import gsm_renderer_tpu as G
    from gsm_renderer_tpu import config as cfg
    from gsm_renderer_tpu.io.scene import generate_visible_gaussians
    from gsm_renderer_tpu.kernels import blend as K
    from gsm_renderer_tpu.ops import binning as B
    from gsm_renderer_tpu.ops.project import project_and_cull
    from gsm_renderer_tpu.pipelines.common import (fused_binning_words,
                                                   pack_record_words)
    import jax

    n = 1_000_000
    w, h = 1920, 1080
    capacity = 3_002_368
    tiles_x, tiles_y = cfg.tiles_for(w, h, 16, 16)
    ds = generate_visible_gaussians(n, sh_degree=3, scale_range=(0.002, 0.012))
    cam = G.make_camera(w, h, far=50.0)
    gi = ds.to_input()
    view, proj, center = cam.astuple_jax()
    kw = dict(width=w, height=h, tile_w=16, tile_h=16, sh_degree=3,
              near_plane=0.1, far_plane=50.0, alpha_threshold=0.005,
              total_ink_threshold=2.0, input_is_srgb=False)
    plan = B.make_key_plan(tiles_x * tiles_y, n, near_plane=0.1, far_plane=50.0)

    def f(gi, view, proj, center):
        pr = project_and_cull(gi, view, proj, center, **kw)
        words = pack_record_words(pr.record)
        word_list = [words[:, k] for k in range(4)]
        sorted_tile, sw, total, _ovf = fused_binning_words(
            pr.visible, pr.min_tx, pr.min_ty, pr.max_tx, pr.rect_count,
            pr.depth_key, word_list, capacity=capacity, tiles_x=tiles_x,
            fused_depth16=False, use_pallas=True, exact_test=True,
            key_plan=plan)
        starts, counts_t = B.extract_tile_ranges(sorted_tile, tiles_x * tiles_y)
        table = K.build_words_table(sw, capacity)
        tc, td = K.blend_tiles_pallas(table, starts, counts_t,
                                      tiles_x=tiles_x, tiles_y=tiles_y)
        return K.assemble_image(tc, td, tiles_x=tiles_x, tiles_y=tiles_y,
                                width=w, height=h)

    return jax.jit(f).lower(gi, view, proj, center)


def main():
    lw = build()
    opts = None
    if len(sys.argv) > 1 and sys.argv[1] != "default":
        opts = {"xla_tpu_msa_sort_order_overrides": sys.argv[1]}
    comp = lw.compile(compiler_options=opts) if opts else lw.compile()
    txt = comp.as_text()
    out = "/tmp/hlo_opt.txt" if opts is None else "/tmp/hlo_opt_opt.txt"
    with open(out, "w") as fh:
        fh.write(txt)
    lines = txt.splitlines()
    print(f"{len(lines)} HLO lines -> {out}")
    # S(1) = alternate memory space annotations
    s1 = [i for i, l in enumerate(lines) if "S(1)" in l]
    print(f"{len(s1)} lines with S(1)")
    sort_lines = [i for i, l in enumerate(lines)
                  if re.search(r'= \([^)]*\) sort', l) or ' sort(' in l]
    print(f"sort instructions at lines: {sort_lines[:10]}")
    # report S(1) ops by opcode histogram
    hist = {}
    for i in s1:
        m = re.match(r'\s*(%?[\w.\-]+) = .*? (\w+)\(', lines[i])
        op = m.group(2) if m else "?"
        hist[op] = hist.get(op, 0) + 1
    print("S(1) line opcode histogram:", dict(sorted(hist.items(),
                                                     key=lambda kv: -kv[1])))
    # show context around the first sort
    for si in sort_lines[:2]:
        print("\n--- context around sort line", si)
        for j in range(max(0, si - 3), min(len(lines), si + 4)):
            print(lines[j][:240])


if __name__ == "__main__":
    main()
