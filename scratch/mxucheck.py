"""Numeric check: exponent_mode='mxu' vs 'vpu' vs XLA oracle, CPU interpret.

Covers uniform mono, r2_cutoff, and the warped (foveated) path.
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from gsm_renderer_tpu.kernels import blend as K

    rng = np.random.default_rng(7)
    tiles_x, tiles_y = 6, 4
    n_t = tiles_x * tiles_y
    cap = 1024
    n_live = 900

    # synth instances: means scattered over the 96x64 px screen
    mx = rng.uniform(0, tiles_x * 16, n_live).astype(np.float32)
    my = rng.uniform(0, tiles_y * 16, n_live).astype(np.float32)
    s1 = rng.uniform(0.6, 12.0, n_live).astype(np.float32)
    s2 = rng.uniform(0.6, 12.0, n_live).astype(np.float32)
    th = rng.uniform(0, np.pi, n_live).astype(np.float32)
    op = (rng.integers(1, 256, n_live).astype(np.float32)) / 255.0
    col = (rng.integers(0, 256, (n_live, 3)).astype(np.float32)) / 255.0
    dep = rng.uniform(0.1, 50.0, n_live).astype(np.float32)

    # quantize like the record packer: f16 mean/scales/depth, u16 theta, u8 rgba
    def f16b(x):
        return np.asarray(x, np.float16).view(np.uint16).astype(np.uint32)

    thq = np.round(th / np.pi * 65535.0).astype(np.uint32)
    w0 = f16b(mx) | (f16b(my) << 16)
    w1 = thq | (f16b(s1) << 16)
    w2 = f16b(s2) | (f16b(dep) << 16)
    w3 = (np.round(col[:, 0] * 255).astype(np.uint32)
          | (np.round(col[:, 1] * 255).astype(np.uint32) << 8)
          | (np.round(col[:, 2] * 255).astype(np.uint32) << 16)
          | (np.round(op * 255).astype(np.uint32) << 24))

    # per-tile spans: assign instances round-robin, contiguous spans
    per = n_live // n_t
    starts = (np.arange(n_t) * per).astype(np.int32)
    counts = np.full(n_t, per, np.int32)
    counts[3] = 0           # empty-tile path
    counts[5] = per - 7     # dead tail slots within the span

    words = [np.zeros(cap, np.uint32) for _ in range(4)]
    for k, w in enumerate((w0, w1, w2, w3)):
        words[k][:n_live] = w
    # zero dead tail of tile 5's span
    t5 = starts[5] + counts[5]
    for k in range(4):
        words[k][t5:starts[5] + per] = 0

    table = K.build_words_table([jnp.asarray(w) for w in words], cap)

    # decode back (exactly like the kernel does) for the XLA oracle attrs
    mxd = np.asarray(jnp.asarray(w0).view(jnp.uint32))
    def deco(bits):
        return np.frombuffer(
            np.asarray(bits, np.uint16).tobytes(), np.float16
        ).astype(np.float32)
    mx_d = deco(w0 & 0xFFFF); my_d = deco(w0 >> 16)
    s1_d = np.maximum(deco(w1 >> 16), 1e-4)
    s2_d = np.maximum(deco(w2 & 0xFFFF), 1e-4)
    dep_d = deco(w2 >> 16)
    th_d = (w1 & 0xFFFF).astype(np.float32) * (np.pi / 65535.0)
    op_d = ((w3 >> 24) & 0xFF).astype(np.float32) / 255.0
    r_d = (w3 & 0xFF).astype(np.float32) / 255.0
    g_d = ((w3 >> 8) & 0xFF).astype(np.float32) / 255.0
    b_d = ((w3 >> 16) & 0xFF).astype(np.float32) / 255.0
    c, s = np.cos(th_d), np.sin(th_d)
    a1 = c / s1_d; b1 = s / s1_d
    a2 = -s / s2_d; b2 = c / s2_d

    def padc(x):
        o = np.zeros(cap, np.float32); o[:n_live] = x; return o

    attrs = dict(a1=padc(a1), b1=padc(b1),
                 c1=padc(-(a1 * mx_d + b1 * my_d)),
                 a2=padc(a2), b2=padc(b2),
                 c2=padc(-(a2 * mx_d + b2 * my_d)),
                 r=padc(r_d), g=padc(g_d), b=padc(b_d),
                 depth=padc(dep_d), op=padc(op_d))
    # kill dead tail in oracle attrs too
    for k in attrs:
        attrs[k][t5:starts[5] + per] = 0.0
    attr_table = K.build_blend_table({k: jnp.asarray(v)
                                      for k, v in attrs.items()}, cap)

    oc, od = K.blend_tiles_xla(attr_table, jnp.asarray(starts),
                               jnp.asarray(counts), tiles_x=tiles_x,
                               tiles_y=tiles_y, max_per_tile=per)

    for mode in ("vpu", "mxu"):
        tc, td = K.blend_tiles_pallas(table, jnp.asarray(starts),
                                      jnp.asarray(counts), tiles_x=tiles_x,
                                      tiles_y=tiles_y, interpret=True,
                                      exponent_mode=mode)
        ec = float(jnp.max(jnp.abs(tc - oc)))
        ed = float(jnp.max(jnp.abs(td - od)))
        print(f"uniform {mode}: max|dcolor|={ec:.3e} max|ddepth|={ed:.3e}")

    # r2_cutoff path
    oc2, od2 = K.blend_tiles_xla(attr_table, jnp.asarray(starts),
                                 jnp.asarray(counts), tiles_x=tiles_x,
                                 tiles_y=tiles_y, max_per_tile=per,
                                 r2_cutoff=9.0)
    for mode in ("vpu", "mxu"):
        tc, td = K.blend_tiles_pallas(table, jnp.asarray(starts),
                                      jnp.asarray(counts), tiles_x=tiles_x,
                                      tiles_y=tiles_y, interpret=True,
                                      r2_cutoff=9.0, exponent_mode=mode)
        ec = float(jnp.max(jnp.abs(tc - oc2)))
        ed = float(jnp.max(jnp.abs(td - od2)))
        print(f"r2cut   {mode}: max|dcolor|={ec:.3e} max|ddepth|={ed:.3e}")

    # warped path: mild nonuniform pixel coords
    px = np.arange(16, dtype=np.float32)
    cx = np.stack([tx * 16 + px * (1.0 + 0.4 * tx / tiles_x)
                   for tx in range(tiles_x)])          # (TX, 16)
    cy = np.stack([ty * 16 + px * (1.0 + 0.3 * ty / tiles_y)
                   for ty in range(tiles_y)])
    coord_x = np.repeat(cx[:, None, :], 16, axis=1).reshape(tiles_x, 256)
    # pixel p = y*16+x: x varies fastest
    coord_x = np.tile(cx, (1, 16))                     # (TX, 256): x pattern
    coord_y = np.repeat(cy, 16, axis=1)                # (TY, 256): y pattern
    pc = (jnp.asarray(coord_x), jnp.asarray(coord_y))
    ocw, odw = K.blend_tiles_xla(attr_table, jnp.asarray(starts),
                                 jnp.asarray(counts), tiles_x=tiles_x,
                                 tiles_y=tiles_y, max_per_tile=per,
                                 pixel_coords=pc)
    for mode in ("vpu", "mxu"):
        tc, td = K.blend_tiles_pallas(table, jnp.asarray(starts),
                                      jnp.asarray(counts), tiles_x=tiles_x,
                                      tiles_y=tiles_y, interpret=True,
                                      pixel_coords=pc, exponent_mode=mode)
        ec = float(jnp.max(jnp.abs(tc - ocw)))
        ed = float(jnp.max(jnp.abs(td - odw)))
        print(f"warped  {mode}: max|dcolor|={ec:.3e} max|ddepth|={ed:.3e}")


main()
