"""A/B follow-up to sortkeyab.py: the unstable sort is comparator/key-bound
(2 keys 4.49 ms vs 1 key 1.95 ms @ 3.0M, operands nearly free).  Questions:
  1. does a u64 single key cost like one key or two?  (would let
     [tile|depth|idx] ride one key, no restructure)
  2. does a NARROW (u8/u16) second key cost less than a u32 one?
     (would let [tile|rank_hi],[rank_lo] keep 2-key structure cheaply)
  3. what does the 1M-gaussian (depth,idx) pre-sort for the rank scheme
     cost, and an 11-plane gather into rank order?
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

    def u32(n):
        return jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint64)
                           .astype(np.uint32))

    n = 3_002_368
    m = 1_048_576

    # 1. u64 single key, 6 payload operands
    try:
        args = (jnp.asarray(rng.integers(0, 2**63, n, dtype=np.uint64)),) + \
               tuple(u32(n) for _ in range(5))
        ms = t(lambda *a: jax.lax.sort(a, num_keys=1, is_stable=False)[0][0],
               *args)
        print(f"3.0M u64-key ops=6 keys=1: {ms:.2f} ms", flush=True)
    except Exception as e:
        print(f"3.0M u64-key FAILED: {type(e).__name__}: {e}", flush=True)

    # 2. narrow second key
    for dt, name in ((np.uint8, 'u8'), (np.uint16, 'u16'), (np.uint32, 'u32')):
        k2 = jnp.asarray(rng.integers(0, np.iinfo(dt).max, n,
                                      dtype=np.int64).astype(dt))
        args = (u32(n), k2) + tuple(u32(n) for _ in range(4))
        ms = t(lambda *a: jax.lax.sort(a, num_keys=2, is_stable=False)[0][0],
               *args)
        print(f"3.0M (u32,{name}) ops=6 keys=2: {ms:.2f} ms", flush=True)

    # 3a. gaussian pre-sort: 1M x (depth u32, idx u32) 2-key unstable,
    #     payload = idx permutation only
    args = (u32(m), jnp.arange(m, dtype=jnp.uint32))
    ms = t(lambda *a: jax.lax.sort(a, num_keys=2, is_stable=False)[0][0],
           *args)
    print(f"1.0M (depth,idx) ops=2 keys=2: {ms:.2f} ms", flush=True)
    # u64 single-key variant of the same
    k = jnp.asarray(rng.integers(0, 2**63, m, dtype=np.uint64))
    ms = t(lambda *a: jax.lax.sort(a, num_keys=1, is_stable=False)[0][0],
           k, jnp.arange(m, dtype=jnp.uint32))
    print(f"1.0M u64-key ops=2 keys=1: {ms:.2f} ms", flush=True)

    # 3b. 11-plane gather of 1M f32 rows by a permutation
    planes = jnp.asarray(rng.standard_normal((11, m), dtype=np.float32))
    perm = jnp.asarray(rng.permutation(m).astype(np.int32))
    ms = t(lambda p, ix: p[:, ix], planes, perm)
    print(f"11-plane (11,1M) f32 gather: {ms:.2f} ms", flush=True)


main()
