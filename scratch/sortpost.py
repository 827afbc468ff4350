"""Composed-sort pathology, consumer side: the BACKLOG receipts established
that a sort composed with a PRODUCER (even x^1) costs ~10.4 ms vs 4.5 own-
program at 3.0M/6ops.  Is a sort composed with only CONSUMERS (sort feeds
the post stages, operands are program inputs) also poisoned?  If not, the
frame can split as TWO programs (pre | sort+post) — one dispatch fewer
than the 3-program split, which matters through the tunnel (~2-3 ms per
execution).

Programs measured (slope-timed):
  A: bare sort (6 ops, 2 keys, unstable)          — baseline ~4.5
  B: sort + trivial consumer (sum of one element of each output)
  C: sort + ranges + wtable build (real post front half)
  D: trivial producer (x+0) -> sort               — known-poisoned control
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

    from gsm_renderer_tpu import config as cfg
    from gsm_renderer_tpu.kernels import blend as K
    from gsm_renderer_tpu.ops import binning as B

    n = 3_002_368
    tiles_x, tiles_y = cfg.tiles_for(1920, 1080, 16, 16)
    rng = np.random.RandomState(0)
    key1 = jnp.asarray(rng.randint(0, 1 << 31, n, dtype=np.int64)
                       .astype(np.uint32))
    key2 = jnp.asarray(rng.randint(0, 1 << 31, n, dtype=np.int64)
                       .astype(np.uint32))
    ws = [jnp.asarray(rng.randint(0, 1 << 31, n, dtype=np.int64)
                      .astype(np.uint32)) for _ in range(4)]
    args = (key1, key2, *ws)

    @jax.jit
    def prog_a(k1, k2, w0, w1, w2, w3):
        outs = jax.lax.sort((k1, k2, w0, w1, w2, w3), num_keys=2,
                            is_stable=False)
        return outs

    @jax.jit
    def prog_b(k1, k2, w0, w1, w2, w3):
        outs = jax.lax.sort((k1, k2, w0, w1, w2, w3), num_keys=2,
                            is_stable=False)
        return sum(o[0].astype(jnp.float32) for o in outs)

    @jax.jit
    def prog_c(k1, k2, w0, w1, w2, w3):
        outs = jax.lax.sort((k1, k2, w0, w1, w2, w3), num_keys=2,
                            is_stable=False)
        sorted_key, sw = outs[0], outs[2:]
        sorted_tile = jnp.where(sorted_key == jnp.uint32(0xFFFFFFFF),
                                jnp.uint32(0xFFFFFFFF), sorted_key >> 19)
        starts, counts = B.extract_tile_ranges(sorted_tile,
                                               tiles_x * tiles_y)
        table = K.build_words_table(sw, n)
        return (starts[0] + counts[-1]
                + jnp.ravel(table)[0] + jnp.ravel(table)[-1])

    @jax.jit
    def prog_d(k1, k2, w0, w1, w2, w3):
        k1 = k1 + jnp.uint32(0)  # trivial producer (known-poisoned control)
        w0 = w0 ^ jnp.uint32(0)
        outs = jax.lax.sort((k1, k2, w0, w1, w2, w3), num_keys=2,
                            is_stable=False)
        return sum(o[0].astype(jnp.float32) for o in outs)

    def t(f):
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
        a, b = chain(2), chain(8)
        return (b - a) / 6 * 1000

    for rep in range(3):
        print(f"rep{rep}: bare {t(prog_a):5.2f}  +consumer {t(prog_b):5.2f}  "
              f"+post(ranges+table) {t(prog_c):5.2f}  producer-> "
              f"{t(prog_d):5.2f} ms", flush=True)


if __name__ == "__main__":
    main()
