"""Attribute expand-kernel cost on the real chip: in-kernel exact test,
per-plane window gathers (two_rows select chains), and window size.

Variants (timing-only; some produce WRONG outputs, never ship them):
  base        — production path (masks + in-kernel test)
  notest      — exact_test=False (same table/planes, no in-kernel re-test)
  fewplanes   — aux = [depth] only (isolates per-plane gather cost)
  win14       — WIN_ROWS monkeypatched 34 -> 14 (valid only while every
                4096-slot block spans <= ~12 window rows; checked first in
                numpy and reported)

Usage: python scratch/expandprobe.py [n]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def main():
    import jax
    jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.0)
    import jax.numpy as jnp

    import gsm_renderer_tpu as G
    from gsm_renderer_tpu import config as cfg
    from gsm_renderer_tpu.io.scene import generate_visible_gaussians
    from gsm_renderer_tpu.kernels import expand as E
    from gsm_renderer_tpu.ops.project import project_and_cull
    from gsm_renderer_tpu.pipelines.common import binning_inputs, \
        pack_record_words

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    w, h = 1920, 1080
    tiles_x, tiles_y = cfg.tiles_for(w, h, 16, 16)
    ds = generate_visible_gaussians(n, sh_degree=3, scale_range=(0.002, 0.012))
    cam = G.make_camera(w, h, far=50.0)
    gi = ds.to_input()
    view, proj, center = cam.astuple_jax()
    kw = dict(width=w, height=h, tile_w=16, tile_h=16, sh_degree=3,
              near_plane=0.1, far_plane=50.0, alpha_threshold=0.005,
              total_ink_threshold=2.0, input_is_srgb=False)

    # precompute the binning inputs ONCE on device so variants time ONLY the
    # expand kernel (project+prep is common-mode)
    @jax.jit
    def prep(gi, view, proj, center):
        pr = project_and_cull(gi, view, proj, center, **kw)
        words = pack_record_words(pr.record)
        word_list = [words[:, k] for k in range(4)]
        counts, rect_word, tile_mask, aux = binning_inputs(
            pr.visible, pr.min_tx, pr.min_ty, pr.max_tx, pr.rect_count,
            pr.depth_key, word_list, exact_test=True)
        return counts, rect_word, tile_mask, aux

    counts, rect_word, tile_mask, aux = prep(gi, view, proj, center)
    counts = jax.block_until_ready(counts)
    total = int(np.asarray(jnp.cumsum(counts))[-1])
    capacity = -(-int(total * 1.05) // 8192) * 8192
    print(f"live {total}, capacity {capacity}", flush=True)

    # window-span check for win14: max gaussians any 4096-slot block spans
    off = np.concatenate([[0], np.cumsum(np.asarray(counts))])
    blocks = np.arange(0, capacity, E.BLK)
    r0 = np.searchsorted(off, blocks, side="right") - 1
    r0 = np.clip(r0, 0, n - 1)
    r1 = np.searchsorted(off, np.minimum(blocks + E.BLK, off[-1]),
                         side="right") - 1
    span_rows = int(np.max((r1 - r0) // 128)) + 2
    print(f"max window rows used: {span_rows} (of {E.WIN_ROWS})", flush=True)

    def run(tag, exact, aux_list, win_rows=None):
        old = E.WIN_ROWS
        if win_rows is not None:
            E.WIN_ROWS = win_rows
        try:
            # the RAW function (jit caches by abstract signature and would
            # otherwise serve the WIN_ROWS=34 jaxpr to the win14 variant)
            raw = E.expand_slots_pallas.__wrapped__
            f = jax.jit(lambda c, r, m, *a: raw(
                c, r, list(a), capacity=capacity, tiles_x=tiles_x,
                fused_depth16=False, exact_test=exact,
                tile_mask=(m if exact else None))[0])
            args = (counts, rect_word, tile_mask) + tuple(aux_list)
            np.asarray(f(*args)).ravel()[:1]
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(8):
                    r = f(*args)
                np.asarray(r).ravel()[:1]
                best = min(best, (time.perf_counter() - t0) / 8)
            print(f"{tag}: {best*1000:.2f} ms", flush=True)
        finally:
            E.WIN_ROWS = old

    run("base      ", True, aux)
    run("notest    ", False, aux)
    run("fewplanes ", False, aux[:1])
    if span_rows <= 14:
        run("win14     ", True, aux, win_rows=14)
        run("win14notst", False, aux, win_rows=14)


if __name__ == "__main__":
    main()
