"""Which part of the expand prep costs 6.8 ms?"""
import os, sys, time
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
    from gsm_renderer_tpu.ops import binning as B
    from gsm_renderer_tpu.ops.project import project_and_cull
    from gsm_renderer_tpu.pipelines.common import pack_record_words

    n = 1_000_000
    w, h = 1920, 1080
    capacity = -(-(4 * n) // 8192) * 8192
    tiles_x, tiles_y = cfg.tiles_for(w, h, 16, 16)
    ds = generate_visible_gaussians(n, sh_degree=3, scale_range=(0.002, 0.012))
    cam = G.make_camera(w, h, far=50.0)
    gi = ds.to_input()
    view, proj, center = cam.astuple_jax()
    kw = dict(width=w, height=h, tile_w=16, tile_h=16, sh_degree=3,
              near_plane=0.1, far_plane=50.0, alpha_threshold=0.005,
              total_ink_threshold=2.0, input_is_srgb=False)

    def common(gi, view, proj, center):
        pr = project_and_cull(gi, view, proj, center, **kw)
        words = pack_record_words(pr.record)
        rect_word = B.pack_rect_word(pr.min_tx, pr.min_ty,
                                     (pr.max_tx - pr.min_tx + 1))
        rect_word = jnp.where(pr.visible, rect_word,
                              rect_word | jnp.uint32(E.CULLED_BIT))
        counts = jnp.maximum(pr.rect_count, 1).astype(jnp.int32)
        aux = [pr.depth_key] + [words[:, k] for k in range(4)]
        return rect_word, counts, aux

    def s1(gi, view, proj, center):
        rect_word, counts, aux = common(gi, view, proj, center)
        return rect_word[0] + jnp.uint32(counts[-1]) + aux[0][0]

    def s2(gi, view, proj, center):
        rect_word, counts, aux = common(gi, view, proj, center)
        offsets_ex = jnp.concatenate([jnp.zeros(1, jnp.int32),
                                      jnp.cumsum(counts)])
        return rect_word[0] + jnp.uint32(offsets_ex[-1]) + aux[0][0]

    def s3(gi, view, proj, center):
        rect_word, counts, aux = common(gi, view, proj, center)
        offsets_ex = jnp.concatenate([jnp.zeros(1, jnp.int32),
                                      jnp.cumsum(counts)])
        n_blocks = capacity // E.BLK
        block_r0 = jnp.searchsorted(
            offsets_ex, jnp.arange(n_blocks, dtype=jnp.int32) * E.BLK,
            side="right").astype(jnp.int32)
        row_r0 = jnp.searchsorted(
            offsets_ex,
            jnp.arange(n_blocks * E.BLK_SUB, dtype=jnp.int32) * 128,
            side="right").astype(jnp.int32)
        return (rect_word[0] + jnp.uint32(block_r0[-1] + row_r0[-1])
                + aux[0][0])

    def s4(gi, view, proj, center):
        rect_word, counts, aux = common(gi, view, proj, center)
        offsets_ex = jnp.concatenate([jnp.zeros(1, jnp.int32),
                                      jnp.cumsum(counts)])
        n2 = rect_word.shape[0]
        np_rows = -(-(n2 + 2) // 128) + E.WIN_ROWS
        pad_to = np_rows * 128 - (n2 + 1)
        off_t = jnp.pad(offsets_ex, (0, pad_to),
                        constant_values=E.OFFSET_PAD).reshape(np_rows, 128)
        planes = [E._pad_rows(rect_word, n2)] + [E._pad_rows(a, n2) for a in aux]
        rows = max(off_t.shape[0], planes[0].shape[0])
        off_t = jnp.pad(off_t, ((0, rows - off_t.shape[0]), (0, 0)),
                        constant_values=E.OFFSET_PAD)
        planes = [jnp.pad(p, ((0, rows - p.shape[0]), (0, 0), (0, 0)))
                  for p in planes]
        tab = jnp.concatenate([off_t[:, None, :]] + planes, axis=1)
        return tab[0, 0, 0] + tab[-1, -1, -1]

    args = (gi, view, proj, center)
    def t(fn, tag):
        f = jax.jit(fn)
        np.asarray(f(*args)).ravel()[:1]
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(5):
                r = f(*args)
            np.asarray(r).ravel()[:1]
            best = min(best, (time.perf_counter() - t0) / 5)
        print(f"{tag}: {best*1000:.2f} ms", flush=True)

    t(s1, "base (project+pack+rect)")
    t(s2, "base+cumsum")
    t(s3, "base+cumsum+searchsorted")
    t(s4, "base+cumsum+tab-concat")

main()
