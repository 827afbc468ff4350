"""A/B lax.sort stability variants at the headline instance scale.

Stable sorts on XLA add an implicit index tiebreak; an UNSTABLE sort with an
EXPLICIT iota third key reproduces the reference tie order (stable
depth-then-tile) bit-exactly while letting XLA skip its stability machinery —
if that machinery costs anything.  Also measures unstable-2-key (tie order
unspecified — NOT parity-safe, lower bound only).
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

def main():
    import jax
    jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.0)
    import jax.numpy as jnp

    c = 3_000_320
    rng = np.random.default_rng(3)
    key = jnp.asarray(rng.integers(0, 8160, c, dtype=np.uint32))
    dep = jnp.asarray(rng.integers(0, 2**32, c, dtype=np.uint64).astype(np.uint32))
    ws = [jnp.asarray(rng.integers(0, 2**32, c, dtype=np.uint64).astype(np.uint32))
          for _ in range(4)]

    def t(f):
        args = (key, dep, *ws)
        r = f(*args)
        np.asarray(r[0][:1])
        def chain(k):
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(k):
                    r = f(*args)
                np.asarray(r[0][:1])
                best = min(best, time.perf_counter() - t0)
            return best
        t3, t6 = chain(3), chain(6)
        return (t6 - t3) / 3 * 1000

    @jax.jit
    def stable2(k, d, *w):
        return jax.lax.sort((k, d, *w), num_keys=2, is_stable=True)

    @jax.jit
    def unstable2(k, d, *w):
        return jax.lax.sort((k, d, *w), num_keys=2, is_stable=False)

    @jax.jit
    def unstable3(k, d, *w):
        i = jax.lax.iota(jnp.uint32, k.shape[0])
        return jax.lax.sort((k, d, i, *w), num_keys=3, is_stable=False)

    # parity: unstable3 must equal stable2 exactly (all keys distinct w/ iota)
    a = stable2(key, dep, *ws)
    b = unstable3(key, dep, *ws)
    same = all(bool(jnp.array_equal(x, y)) for x, y in zip(a, (b[0], b[1], *b[3:])))
    print("unstable3 == stable2:", same, flush=True)

    for name, f in (("stable2", stable2), ("unstable2", unstable2),
                    ("unstable3", unstable3)) * 2:
        print(f"{name}: {t(f):.2f} ms", flush=True)

main()
