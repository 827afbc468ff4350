"""A/B: k-ary extract_tile_ranges vs the old searchsorted(scan_unrolled)
binary search, at the headline instance scale.  Checks bitwise-equal bounds
then slope-times both as standalone programs AND composed after a sort
(the production position)."""
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

    from gsm_renderer_tpu import config as cfg
    from gsm_renderer_tpu.ops import binning as B

    n = 3_002_368
    tiles_x, tiles_y = cfg.tiles_for(1920, 1080, 16, 16)
    num_tiles = tiles_x * tiles_y
    rng = np.random.RandomState(0)
    # realistic distribution: sorted tile keys + 5% sentinel tail
    keys = np.sort(rng.randint(0, num_tiles, int(n * 0.95)).astype(np.uint32))
    keys = np.concatenate([keys, np.full(n - len(keys), 0xFFFFFFFF,
                                         np.uint32)])
    sk = jnp.asarray(keys)

    def old_ranges(sorted_key):
        tiles = jnp.arange(num_tiles + 1, dtype=jnp.uint32)
        bounds = jnp.searchsorted(sorted_key, tiles, side="left",
                                  method="scan_unrolled").astype(jnp.int32)
        return bounds[:-1], bounds[1:] - bounds[:-1]

    old = jax.jit(old_ranges)
    for fanout in (8, 16, 32):
        new = jax.jit(lambda k, f=fanout: B.extract_tile_ranges(
            k, num_tiles, fanout=f))
        s0, c0 = [np.asarray(x) for x in old(sk)]
        s1, c1 = [np.asarray(x) for x in new(sk)]
        print(f"fanout {fanout}: bitexact="
              f"{np.array_equal(s0, s1) and np.array_equal(c0, c1)}",
              flush=True)

    def t(f, *args):
        r = f(*args)
        np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[:1]

        def chain(k):
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(k):
                    r = f(*args)
                np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[:1]
                best = min(best, time.perf_counter() - t0)
            return best
        a, b = chain(2), chain(10)
        return (b - a) / 8 * 1000

    news = {f: jax.jit(lambda k, f=f: B.extract_tile_ranges(k, num_tiles,
                                                            fanout=f))
            for f in (8, 16, 32)}
    for rep in range(3):
        row = f"rep{rep}: old {t(old, sk):5.2f}"
        for f, fn in news.items():
            row += f"  k{f} {t(fn, sk):5.2f}"
        print(row + " ms", flush=True)


if __name__ == "__main__":
    main()
