"""A/B lax.sort cost vs capacity, operand count, key count, and banding on
the real chip (slope-timed)."""
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
                r = args[0]
                for _ in range(k):
                    r2 = f(*args)
                np.asarray(r2).ravel()[:1]
                best = min(best, time.perf_counter() - t0)
            return best
        t2, t5 = chain(2), chain(5)
        return (t5 - t2) / 3 * 1000

    def mk(n, ops):
        key = jnp.asarray(rng.integers(0, 8160, n, dtype=np.uint32))
        arrs = [key] + [jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint64)
                                    .astype(np.uint32)) for _ in range(ops - 1)]
        return tuple(arrs)

    for n in (2 * 1024 * 1024, 3 * 1024 * 1024, 4 * 1024 * 1024):
        for ops, keys in ((6, 2), (5, 1), (2, 1)):
            args = mk(n, ops)
            ms = t(lambda *a: jax.lax.sort(a, num_keys=keys)[1][0], *args)
            print(f"n={n//1024//1024}M ops={ops} keys={keys}: {ms:.2f} ms",
                  flush=True)

    # banded: independent sorts as one batched sort (leading batch axis)
    for n in (3 * 1024 * 1024, 3407872):
      for b in (4, 8, 16):
        nn = -(-n // (b * 1024)) * (b * 1024)
        args = tuple(a[:nn - (nn - n)] for a in mk(nn, 6))
        args = tuple(a.reshape(b, nn // b) for a in args)
        ms = t(lambda *a: jax.lax.sort(a, num_keys=2, dimension=1)[1][0, 0],
               *args)
        print(f"banded b={b} n={nn}: {ms:.2f} ms", flush=True)


main()
