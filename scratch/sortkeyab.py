"""A/B: unstable lax.sort cost vs key count and operand count at the
headline capacity (3.0M).  Question: with the tie-free KeyPlan the sort no
longer needs stability — does dropping to ONE key (if the order fit 32 bits)
buy anything, i.e. is the network phase comparator-bound or movement-bound?
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def main():
    import jax
    jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.0)
    import jax.numpy as jnp

    rng = np.random.default_rng(0)

    def t(fn, *args):
        f = jax.jit(fn)
        np.asarray(f(*args)).ravel()[:1]
        def chain(k):
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(k):
                    r2 = f(*args)
                np.asarray(r2).ravel()[:1]
                best = min(best, time.perf_counter() - t0)
            return best
        t2, t5 = chain(2), chain(5)
        return (t5 - t2) / 3 * 1000

    def mk(n, ops):
        # realistic key1: [tile:13 | depth_hi:19]
        key = jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint64)
                          .astype(np.uint32))
        arrs = [key] + [jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint64)
                                    .astype(np.uint32)) for _ in range(ops - 1)]
        return tuple(arrs)

    n = 3_002_368
    for ops, keys, stable in ((6, 2, False), (6, 1, False), (5, 1, False),
                              (2, 2, False), (2, 1, False), (1, 1, False),
                              (6, 2, True)):
        args = mk(n, ops)
        ms = t(lambda *a: jax.lax.sort(a, num_keys=keys,
                                       is_stable=stable)[0][0], *args)
        print(f"n=3.0M ops={ops} keys={keys} stable={stable}: {ms:.2f} ms",
              flush=True)


main()
