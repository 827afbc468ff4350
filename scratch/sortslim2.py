"""Composed-sort cost law: count vs volume.  (2ops 4.3, 6ops 10.6 —
scratch/sortslim.py.)  Sweeps u32 operand counts and tries 2xu64 payload
packing (same volume as 4xu32, half the count) under in-process x64.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    jax.config.update('jax_enable_x64', True)
    jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.0)
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    cap = 3_002_368
    arrs = tuple(jnp.asarray(
        rng.integers(0, 2**32, cap, dtype=np.uint64).astype(np.uint32))
        for _ in range(6))

    def touch(ops):
        s = jnp.float32(0.0)
        for k, x in enumerate(ops):
            s = s + x[k].astype(jnp.float32)
        return s

    def t(f, args_):
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

    def mk_count(nops):
        @jax.jit
        def f(*a):
            ys = tuple(x ^ jnp.uint32(1) for x in a[:nops])
            return touch(jax.lax.sort(ys, num_keys=2, is_stable=False))
        return f

    @jax.jit
    def packed64(*a):
        ys = tuple(x ^ jnp.uint32(1) for x in a)
        p01 = (ys[2].astype(jnp.uint64) << 32) | ys[3].astype(jnp.uint64)
        p23 = (ys[4].astype(jnp.uint64) << 32) | ys[5].astype(jnp.uint64)
        sk, sd, s01, s23 = jax.lax.sort((ys[0], ys[1], p01, p23),
                                        num_keys=2, is_stable=False)
        w0 = (s01 >> 32).astype(jnp.uint32)
        w1 = s01.astype(jnp.uint32)
        w2 = (s23 >> 32).astype(jnp.uint32)
        w3 = s23.astype(jnp.uint32)
        return touch((sk, sd, w0, w1, w2, w3))

    for rep in range(2):
        for nops in (2, 3, 4, 5, 6):
            print(f"rep{rep} composed {nops} x u32: "
                  f"{t(mk_count(nops), arrs):6.2f} ms", flush=True)
        print(f"rep{rep} composed 2xu32 + 2xu64: {t(packed64, arrs):6.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
