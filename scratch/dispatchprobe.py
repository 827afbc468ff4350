"""Probe the axon tunnel's dispatch semantics: does an execute call return
before device completion (async, PJRT-style) or block until done?

Times (a) a single un-fetched dispatch of a ~20 ms program, (b) K chained
un-fetched dispatches, (c) K chained + final fetch, (d) K independent
(non-chained) un-fetched dispatches.  If (a) ~ 0.1-1 ms the tunnel is async
and the 3-program split's loss is NOT raw RPC blocking; if (a) ~ frame time
every dependent dispatch serializes with execution and the split is
structurally blocked on the tunnel (BACKLOG composed-sort section).
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

    # ~20 ms of real device work: big matmul chain
    @jax.jit
    def heavy(x):
        for _ in range(48):
            x = jnp.tanh(x @ x)
        return x

    x = jnp.ones((2048, 2048), jnp.float32) * 1e-3
    y = heavy(x)
    np.asarray(y).ravel()[:1]  # warm + sync

    t0 = time.perf_counter()
    y = heavy(x)
    t_disp = (time.perf_counter() - t0) * 1000
    t0 = time.perf_counter()
    np.asarray(y).ravel()[:1]
    t_fetch = (time.perf_counter() - t0) * 1000
    print(f"single dispatch: {t_disp:.2f} ms, then fetch: {t_fetch:.2f} ms",
          flush=True)

    k = 8
    t0 = time.perf_counter()
    y = x
    for _ in range(k):
        y = heavy(y)
    t_chain = (time.perf_counter() - t0) * 1000
    t0 = time.perf_counter()
    np.asarray(y).ravel()[:1]
    t_cfetch = (time.perf_counter() - t0) * 1000
    print(f"{k} chained dispatches: {t_chain:.2f} ms (+fetch {t_cfetch:.2f})",
          flush=True)

    t0 = time.perf_counter()
    outs = [heavy(x) for _ in range(k)]
    t_ind = (time.perf_counter() - t0) * 1000
    t0 = time.perf_counter()
    for o in outs:
        np.asarray(o).ravel()[:1]
    t_ifetch = (time.perf_counter() - t0) * 1000
    print(f"{k} independent dispatches: {t_ind:.2f} ms "
          f"(+fetch all {t_ifetch:.2f})", flush=True)


if __name__ == "__main__":
    main()
