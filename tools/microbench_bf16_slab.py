#!/usr/bin/env python3
"""Microbench: per-iteration cost of the wide-record slab body variants.

ab_wide_records.py measured W16/W32 bf16 traversals SLOWER than W8 despite
~35% fewer rows/ray — the body cost grew ~1.9x. Suspect: the bf16 decode's
(m, 3W, 2) -> (m, 6W) reshape is a full cross-lane shuffle per iteration.
This isolates slab-body variants inside a dependent while_loop (gather +
slab + argmin, no stack/leaf):

  w8        : classic f32 (m,8) blocks
  w32_shuf  : bf16 pairs, bitcast+reshape decode (what ab measured)
  w32_half  : de-interleaved pairs, integer-op decode (u<<16 / u&0xFFFF0000),
              two (m,16) half-blocks merged at the argmin — NO relayout

Usage: python tools/microbench_bf16_slab.py [N] [ITERS]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 518400
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    rows = 33000

    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.random((rows, 128), np.float32))
    idx0 = jnp.asarray(rng.integers(0, rows, n).astype(np.int32))
    o = jnp.asarray(rng.random((n, 3), np.float32))
    iv = jnp.asarray(1.0 / (rng.random((n, 3), np.float32) + 0.1))
    ox, oy, oz = o[:, 0], o[:, 1], o[:, 2]
    ivx, ivy, ivz = iv[:, 0], iv[:, 1], iv[:, 2]
    big = jnp.float32(3e38)

    def bcast_f32(u):
        return jax.lax.bitcast_convert_type(u, jnp.float32)

    def bcast_i32(x):
        return jax.lax.bitcast_convert_type(x, jnp.int32)

    def slab(lox, loy, loz, hix, hiy, hiz):
        tx0 = (lox - ox[:, None]) * ivx[:, None]
        tx1 = (hix - ox[:, None]) * ivx[:, None]
        ty0 = (loy - oy[:, None]) * ivy[:, None]
        ty1 = (hiy - oy[:, None]) * ivy[:, None]
        tz0 = (loz - oz[:, None]) * ivz[:, None]
        tz1 = (hiz - oz[:, None]) * ivz[:, None]
        tn = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
                         jnp.minimum(tz0, tz1))
        tf = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
                         jnp.maximum(tz0, tz1))
        return tn, tf

    def argmin_merge(keys, codes, width):
        near = jnp.min(keys, axis=1)
        slot = jnp.arange(width, dtype=jnp.int32)[None, :]
        ns = jnp.min(jnp.where(keys <= near[:, None], slot, width), axis=1)
        first = slot == ns[:, None]
        code = jnp.sum(jnp.where(first, codes, 0), axis=1)
        return near, code

    def body_w8(i):
        rec = jnp.take(table, i, axis=0)
        tn, tf = slab(rec[:, 0:8], rec[:, 8:16], rec[:, 16:24],
                      rec[:, 24:32], rec[:, 32:40], rec[:, 40:48])
        keys = jnp.where(tn <= tf, tn, big)
        codes = bcast_i32(rec[:, 48:56])
        _, code = argmin_merge(keys, codes, 8)
        return (i + code % 7 + 1) % rows

    def body_w32_shuf(i):
        rec = jnp.take(table, i, axis=0)
        W = 32
        dec = jax.lax.bitcast_convert_type(rec[:, 0:3 * W], jnp.bfloat16)
        dec = dec.reshape(rec.shape[0], 6 * W).astype(jnp.float32)
        tn, tf = slab(dec[:, 0:W], dec[:, W:2 * W], dec[:, 2 * W:3 * W],
                      dec[:, 3 * W:4 * W], dec[:, 4 * W:5 * W], dec[:, 5 * W:6 * W])
        keys = jnp.where(tn <= tf, tn, big)
        codes = bcast_i32(rec[:, 3 * W:4 * W])
        _, code = argmin_merge(keys, codes, W)
        return (i + code % 7 + 1) % rows

    def body_w32_half(i):
        rec = jnp.take(table, i, axis=0)
        W, H = 32, 16
        u = bcast_i32(rec[:, 0:3 * W])  # 6 fields x H u32 slots
        best_near = None
        best_code = None
        for h in range(2):
            if h == 0:
                fld = [bcast_f32(u[:, f * H:(f + 1) * H] << 16) for f in range(6)]
            else:
                mask = jnp.int32(-65536)  # 0xFFFF0000
                fld = [bcast_f32(u[:, f * H:(f + 1) * H] & mask) for f in range(6)]
            tn, tf = slab(*fld)
            keys = jnp.where(tn <= tf, tn, big)
            codes = bcast_i32(rec[:, 3 * W + h * H:3 * W + (h + 1) * H])
            near, code = argmin_merge(keys, codes, H)
            if best_near is None:
                best_near, best_code = near, code
            else:
                take = near < best_near
                best_near = jnp.minimum(near, best_near)
                best_code = jnp.where(take, code, best_code)
        return (i + best_code % 7 + 1) % rows

    for name, body in (("w8", body_w8), ("w32_shuf", body_w32_shuf),
                       ("w32_half", body_w32_half)):
        @jax.jit
        def loop(idx, _b=body):
            def step(s):
                return (_b(s[0]), s[1] + 1)
            return jax.lax.while_loop(lambda s: s[1] < iters, step, (idx, 0))[0]

        r = loop(idx0)
        float(jax.device_get(r.ravel()[0]))
        ts = []
        for _ in range(3):
            t0 = time.time()
            r = loop(idx0)
            float(jax.device_get(r.ravel()[0]))
            ts.append(time.time() - t0)
        dt = min(ts) / iters
        print(f"{name:10s} {dt*1e3:8.3f} ms/iter  ({n/dt/1e6:6.1f} M rows/s)",
              flush=True)


if __name__ == "__main__":
    main()
