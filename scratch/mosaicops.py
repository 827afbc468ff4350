"""Probe Mosaic op support on this chip for the fused projection kernel:
atan2, mod, isfinite, log, log2, pow, sqrt, rsqrt, u32 shifts/casts,
float->half-bit manual packing building blocks."""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    def try_op(name, fn, ins):
        def kernel(*refs):
            outs = fn(*[r[...] for r in refs[:-1]])
            refs[-1][...] = outs

        x = ins[0]
        try:
            out = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct(x.shape, fn(*ins).dtype),
            )(*ins)
            ref = fn(*ins)
            ok = np.array_equal(np.asarray(out), np.asarray(ref), equal_nan=True)
            print(f"{name:22s}: OK bitexact={ok}", flush=True)
        except Exception as e:
            msg = str(e).split(chr(10))[0][:100]
            print(f"{name:22s}: FAIL {msg}", flush=True)

    f = jnp.linspace(-3.0, 3.0, 1024, dtype=jnp.float32).reshape(8, 128)
    g = jnp.linspace(0.01, 7.0, 1024, dtype=jnp.float32).reshape(8, 128)
    u = (jnp.arange(1024, dtype=jnp.uint32) * 40503).reshape(8, 128)

    try_op("atan2", lambda a, b: jnp.arctan2(a, b), (f, g))
    try_op("mod", lambda a: jnp.mod(a, 3.14159), (f,))
    try_op("isfinite", lambda a: jnp.isfinite(a / (a - a + 1e-30)), (f,))
    try_op("log", jnp.log, (g,))
    try_op("log2", jnp.log2, (g,))
    try_op("pow", lambda a: jnp.power(a, 2.4), (g,))
    try_op("sqrt", jnp.sqrt, (g,))
    try_op("rsqrt", jax.lax.rsqrt, (g,))
    try_op("cos", jnp.cos, (f,))
    try_op("sin", jnp.sin, (f,))
    try_op("floor", jnp.floor, (f,))
    try_op("ceil", jnp.ceil, (f,))
    try_op("f32->i32", lambda a: a.astype(jnp.int32), (f,))
    try_op("f32view_u32", lambda a: a.view(jnp.uint32), (f,))
    try_op("u32shift", lambda a: (a >> 13) | (a << 19), (u,))
    try_op("u32->f32 via i32", lambda a: (a >> 1).astype(jnp.int32)
           .astype(jnp.float32), (u,))
    try_op("clip+round", lambda a: jnp.clip(a * 100.0 + 0.5, 0.0, 65535.0),
           (f,))
    # manual f32 -> f16 bits (RNE) core ops
    def f16_rne(a):
        bits = a.view(jnp.uint32)
        sign = (bits >> 16) & jnp.uint32(0x8000)
        absbits = bits & jnp.uint32(0x7FFFFFFF)
        exp = (absbits >> 23).astype(jnp.int32) - 127
        man = absbits & jnp.uint32(0x7FFFFF)
        # normal path: round mantissa to 10 bits RNE
        shifted = man >> 13
        rem = man & jnp.uint32(0x1FFF)
        round_up = (rem > 0x1000) | ((rem == 0x1000) & ((shifted & 1) == 1))
        h = ((exp + 15).astype(jnp.uint32) << 10) | shifted
        h = h + round_up.astype(jnp.uint32)
        return (sign | jnp.where(exp < -14, jnp.uint32(0), h)) & jnp.uint32(0xFFFF)
    try_op("manual_f16_core", f16_rne, (g,))
    print("done", flush=True)


if __name__ == "__main__":
    main()
