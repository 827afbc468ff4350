"""A/B lax.sort stability on the real chip: the production 2-key stable sort
vs an UNSTABLE sort made deterministic by a uniqueness-restoring third key
(slot iota) — output-identical to the stable sort if faster.

Also probes: unstable 2-key (order-nondeterministic, lower bound only).
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
    n = 3 * 1024 * 1024

    key = jnp.asarray(rng.integers(0, 8160, n, dtype=np.uint32))
    depth = jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint64)
                        .astype(np.uint32))
    words = [jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint64)
                         .astype(np.uint32)) for _ in range(4)]
    iota = jnp.arange(n, dtype=jnp.uint32)

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

    def stable2(*a):
        return jax.lax.sort(a, num_keys=2)[2]

    def unstable3(*a):
        return jax.lax.sort(a, num_keys=3, is_stable=False)[3]

    def unstable2(*a):
        return jax.lax.sort(a, num_keys=2, is_stable=False)[2]

    a2 = (key, depth) + tuple(words)
    a3 = (key, depth, iota) + tuple(words)

    # parity check once (cheap n)
    m = 65536
    s = jax.lax.sort(tuple(x[:m] for x in a2), num_keys=2)
    u = jax.lax.sort(tuple(x[:m] for x in a3), num_keys=3, is_stable=False)
    same = all(bool(jnp.array_equal(s[i], u[0 if i == 0 else i + 1]))
               for i in (0, 1, 2, 3, 4, 5))
    print("unstable3 == stable2 on 64k:", same, flush=True)

    for _ in range(2):
        print(f"stable 2-key 6ops   : {t(stable2, *a2):.2f} ms", flush=True)
        print(f"unstable 3-key 7ops : {t(unstable3, *a3):.2f} ms", flush=True)
        print(f"unstable 2-key 6ops : {t(unstable2, *a2):.2f} ms", flush=True)


main()
