"""Is the 4.5 ms "standalone" 3M sort real, or an artifact of INDEPENDENT
chained dispatches overlapping on the device?  (Composed with ANY producer
in one program the same sort measures 10.4 ms — scratch/sortreal.py.)

  indep   f(args) chained on the same inputs (the usual harness)
  dep     state = f(state) — each dispatch consumes the previous output,
          so device-level overlap across dispatches is impossible
  twice   one program sorting its own sort's output (in-program marginal)
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

    rng = np.random.default_rng(0)
    cap = 3_002_368
    arrs = tuple(jnp.asarray(
        rng.integers(0, 2**32, cap, dtype=np.uint64).astype(np.uint32))
        for _ in range(6))

    f = jax.jit(lambda *a: jax.lax.sort(a, num_keys=2, is_stable=False))

    # XOR the key with a counter-derived word so each dep iteration really
    # re-sorts (sorting an already-sorted array could hit a fast path --
    # sortreal.py says it does not, but keep the input fresh anyway)
    @jax.jit
    def step(state):
        key = state[0] ^ (state[1] << 13) ^ jnp.uint32(0x9E3779B9)
        return jax.lax.sort((key,) + state[1:], num_keys=2, is_stable=False)

    @jax.jit
    def twice(*a):
        s1 = jax.lax.sort(a, num_keys=2, is_stable=False)
        key = s1[0] ^ (s1[1] << 13) ^ jnp.uint32(0x9E3779B9)
        s2 = jax.lax.sort((key,) + tuple(s1[1:]), num_keys=2,
                          is_stable=False)
        out = jnp.float32(0.0)
        for k, x in enumerate(s2):
            out = out + x[k].astype(jnp.float32)
        return out

    def t_indep():
        np.asarray(f(*arrs)[0]).ravel()[:1]

        def chain(k):
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(k):
                    r = f(*arrs)
                np.asarray(r[0]).ravel()[:1]
                best = min(best, time.perf_counter() - t0)
            return best
        a, b = chain(2), chain(8)
        return (b - a) / 6 * 1000

    def t_dep():
        state = step(arrs)
        np.asarray(state[0]).ravel()[:1]

        def chain(k):
            nonlocal state
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(k):
                    state = step(state)
                np.asarray(state[0]).ravel()[:1]
                best = min(best, time.perf_counter() - t0)
            return best
        a, b = chain(2), chain(8)
        return (b - a) / 6 * 1000

    def t_twice():
        np.asarray(twice(*arrs)).ravel()[:1]

        def chain(k):
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(k):
                    r = twice(*arrs)
                np.asarray(r).ravel()[:1]
                best = min(best, time.perf_counter() - t0)
            return best
        a, b = chain(2), chain(8)
        return (b - a) / 6 * 1000

    for rep in range(2):
        print(f"rep{rep} indep-chained: {t_indep():6.2f} ms   "
              f"dep-chained: {t_dep():6.2f} ms   "
              f"one-prog-2x: {t_twice():6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
