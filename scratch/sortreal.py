"""Why does the in-frame instance sort cost 10.3 ms when the standalone
random-data A/B says 4.5 (scratch/framesplit2.py vs sortkeyab.py)?
Candidates: (a) real key DATA (structured, sentinels) vs uniform random;
(b) something about sorting pallas-produced operands in the same program.
Times lax.sort on the REAL expand outputs, re-committed as fresh host
round-tripped arrays, and on uniform random data of the same shape, in one
process.
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
    cap = 3_002_368
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
    def upto_expand(gi, view, proj, center):
        pr = project_and_cull(gi, view, proj, center, **kw)
        words = pack_record_words(pr.record)
        word_list = [words[:, k] for k in range(4)]
        dsw = plan.normalize(pr.depth_key)
        rect_w = pr.max_tx - pr.min_tx + 1
        rect_word0 = B.pack_rect_word(pr.min_tx, pr.min_ty, rect_w)
        rect_word0 = jnp.where(pr.visible, rect_word0,
                               rect_word0 | jnp.uint32(E.CULLED_BIT))
        rect_h = pr.rect_count // jnp.maximum(rect_w, 1)
        tab = E.binning_prep_pallas(
            rect_word0, rect_h, dsw.astype(jnp.uint32),
            [x.astype(jnp.uint32) for x in word_list],
            tile_w=16, tile_h=16, alpha_threshold=0.005, mode="mono")
        outs = E.expand_slots_pallas(
            None, None, None, capacity=cap, tiles_x=tiles_x,
            fused_depth16=False, exact_test=True, tile_w=16, tile_h=16,
            alpha_threshold=0.005, prebuilt_tab=tab, n_gaussians=n,
            key_plan=plan.kernel_tuple)
        return outs[0], outs[1], outs[2], outs[3], outs[4], outs[5]

    real = upto_expand(gi, view, proj, center)
    real_host = [np.asarray(x) for x in real]
    print("live frac:", (real_host[0] != 0xFFFFFFFF).mean(), flush=True)
    fresh = tuple(jnp.asarray(x) for x in real_host)

    rng = np.random.default_rng(0)
    rand = tuple(jnp.asarray(
        rng.integers(0, 2**32, cap, dtype=np.uint64).astype(np.uint32))
        for _ in range(6))

    f = jax.jit(lambda *a: jax.lax.sort(a, num_keys=2,
                                        is_stable=False)[0][0])

    def t(args):
        np.asarray(f(*args)).ravel()[:1]

        def chain(k):
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(k):
                    r = f(*args)
                np.asarray(r).ravel()[:1]
                best = min(best, time.perf_counter() - t0)
            return best
        a, b = chain(2), chain(8)
        return (b - a) / 6 * 1000

    # also: sorted-input (best case) and reverse-sorted (worst case-ish)
    skey = np.sort(real_host[0])
    sorted_in = (jnp.asarray(skey),) + fresh[1:]
    rev_in = (jnp.asarray(skey[::-1].copy()),) + fresh[1:]

    for rep in range(2):
        print(f"rep{rep} real-data sort:   {t(fresh):6.2f} ms", flush=True)
        print(f"rep{rep} random sort:      {t(rand):6.2f} ms", flush=True)
        print(f"rep{rep} presorted-key:    {t(sorted_in):6.2f} ms", flush=True)
        print(f"rep{rep} reversed-key:     {t(rev_in):6.2f} ms", flush=True)

    # (d) sort the DEVICE-RESIDENT pallas outputs directly (no host
    # round-trip: if the expand kernel's output layout is the problem, this
    # shows it without the in-program composition)
    for rep in range(2):
        print(f"rep{rep} device-pallas-out sort: {t(real):6.2f} ms",
              flush=True)

    # (e) composed in ONE program: expand + elementwise touch (no sort) vs
    # expand + sort — isolates the composition cost
    @jax.jit
    def comp_nosort(gi, view, proj, center):
        outs = upto_expand(gi, view, proj, center)
        s = jnp.float32(0.0)
        for x in outs:
            s = s + (x ^ jnp.uint32(1))[0].astype(jnp.float32)
        return s

    @jax.jit
    def comp_sort(gi, view, proj, center):
        outs = upto_expand(gi, view, proj, center)
        ops = jax.lax.sort(outs, num_keys=2, is_stable=False)
        s = jnp.float32(0.0)
        for k, x in enumerate(ops):
            s = s + x[k].astype(jnp.float32)
        return s

    args4 = (gi, view, proj, center)

    def tf(f):
        np.asarray(f(*args4)).ravel()[:1]

        def chain(k):
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(k):
                    r = f(*args4)
                np.asarray(r).ravel()[:1]
                best = min(best, time.perf_counter() - t0)
            return best
        a, b = chain(2), chain(8)
        return (b - a) / 6 * 1000

    for rep in range(2):
        print(f"rep{rep} composed expand+touch: {tf(comp_nosort):6.2f} ms   "
              f"expand+sort: {tf(comp_sort):6.2f} ms", flush=True)

    # (f) is it the PALLAS producer specifically?  Same-shape sort composed
    # after a plain XLA elementwise producer
    @jax.jit
    def comp_xla_sort(*arrs):
        ys = tuple(x ^ jnp.uint32(1) for x in arrs)
        ops = jax.lax.sort(ys, num_keys=2, is_stable=False)
        s = jnp.float32(0.0)
        for k, x in enumerate(ops):
            s = s + x[k].astype(jnp.float32)
        return s

    def tr(f, args_):
        np.asarray(f(*args_)).ravel()[:1]

        def chain(k):
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(k):
                    r = f(*args_)
                np.asarray(r).ravel()[:1]
                best = min(best, time.perf_counter() - t0)
            return best
        a, b = chain(2), chain(8)
        return (b - a) / 6 * 1000

    # (g) optimization_barrier between the pallas expand and the sort
    @jax.jit
    def comp_barrier_sort(gi, view, proj, center):
        outs = upto_expand(gi, view, proj, center)
        outs = jax.lax.optimization_barrier(outs)
        ops = jax.lax.sort(outs, num_keys=2, is_stable=False)
        s = jnp.float32(0.0)
        for k, x in enumerate(ops):
            s = s + x[k].astype(jnp.float32)
        return s

    for rep in range(2):
        print(f"rep{rep} xla-producer+sort: {tr(comp_xla_sort, rand):6.2f} ms"
              f"   expand+barrier+sort: {tf(comp_barrier_sort):6.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
