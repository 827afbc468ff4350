"""Composed-sort operand scaling: standalone lax.sort cost is operand-count
insensitive (6ops 8.63 vs 2ops 8.27 @4M, round-3 receipts), but the
COMPOSED pathology pins operand buffers into VMEM — so composed cost may
scale with operand volume.  If yes: sort (key, d_slot, iota) only and
gather the 4 record words by the sorted permutation afterward.

All variants share one program shape: xor producer -> sort [-> gather].
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

    def touch(ops):
        s = jnp.float32(0.0)
        for k, x in enumerate(ops):
            s = s + x[k].astype(jnp.float32)
        return s

    @jax.jit
    def full6(*a):
        ys = tuple(x ^ jnp.uint32(1) for x in a)
        return touch(jax.lax.sort(ys, num_keys=2, is_stable=False))

    @jax.jit
    def slim3(*a):
        ys = tuple(x ^ jnp.uint32(1) for x in a)
        iota = jax.lax.iota(jnp.uint32, cap)
        sk, sd, perm = jax.lax.sort((ys[0], ys[1], iota), num_keys=2,
                                    is_stable=False)
        gathered = [y[perm] for y in ys[2:]]
        return touch((sk, sd, *gathered))

    @jax.jit
    def keys2(*a):
        ys = tuple(x ^ jnp.uint32(1) for x in a[:2])
        return touch(jax.lax.sort(ys, num_keys=2, is_stable=False))

    @jax.jit
    def batched2(*a):
        ys = tuple((x ^ jnp.uint32(1)).reshape(2, cap // 2) for x in a)
        ops = jax.lax.sort(ys, dimension=1, num_keys=2, is_stable=False)
        return touch(tuple(x.reshape(-1) for x in ops))

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

    for rep in range(2):
        print(f"rep{rep} composed 6ops:        {t(full6, arrs):6.2f} ms",
              flush=True)
        print(f"rep{rep} composed 3ops+gather: {t(slim3, arrs):6.2f} ms",
              flush=True)
        print(f"rep{rep} composed 2ops only:   {t(keys2, arrs):6.2f} ms",
              flush=True)
        print(f"rep{rep} composed (2,1.5M)x6:  {t(batched2, arrs):6.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
