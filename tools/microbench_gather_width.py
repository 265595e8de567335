#!/usr/bin/env python3
"""Microbench: dependent-chain gather rate vs ROW WIDTH on the current device.

PERF_NOTES records the traversal engine as row-count bound (~65-146 M rows/s)
with rate "nearly independent of row width up to 512 B". At 512 B rows that is
only ~62 GB/s — far under HBM bandwidth — so if the rate holds at 1-2 KB rows,
fatter BVH records (24-tri leaves, 64-ary internal nodes) would halve the row
count per ray for free. This measures exactly that: a while_loop whose body
gathers (N, W) f32 rows and consumes a slab-test-like slice pattern, chained
so iterations are data-dependent, for W in {16..512} (64 B .. 2 KB).

Usage: python tools/microbench_gather_width.py [N] [ITERS]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 262144
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    rows = 54722

    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    idx_np = rng.integers(0, rows, n).astype(np.int32)
    idx0 = jnp.asarray(idx_np)

    print(f"device={jax.devices()[0].platform} n={n} iters={iters}", flush=True)

    for recw in (16, 32, 64, 128, 192, 256, 384, 512):
        table = jnp.asarray(rng.random((rows, recw), np.float32))

        def body(i, _t=table, _w=recw):
            rec = jnp.take(_t, i, axis=0)
            # consume ~1/3 of the row as a slab-like slice pattern + reduce
            k = max(_w // 16, 1)
            a = rec[:, 0:k]
            b = rec[:, k:2 * k]
            c = rec[:, 2 * k:3 * k]
            v = jnp.min(jnp.maximum(a, jnp.minimum(b, c)), axis=1)
            return (i + v.astype(jnp.int32) + 1) % rows

        @jax.jit
        def loop(idx, _body=body):
            def b(s):
                return (_body(s[0]), s[1] + 1)
            return jax.lax.while_loop(lambda s: s[1] < iters, b, (idx, 0))[0]

        try:
            r = loop(idx0)
            float(jax.device_get(r.ravel()[0]))
            ts = []
            for _ in range(3):
                t0 = time.time()
                r = loop(idx0)
                float(jax.device_get(r.ravel()[0]))
                ts.append(time.time() - t0)
            dt = min(ts) / iters
            gbs = n * recw * 4 / dt / 1e9
            print(f"W={recw:4d} ({recw*4:5d} B) {dt*1e3:8.3f} ms/iter  "
                  f"{n/dt/1e6:8.1f} M rows/s  {gbs:7.1f} GB/s", flush=True)
        except Exception as e:
            print(f"W={recw:4d} FAILED: {type(e).__name__} {str(e)[:120]}",
                  flush=True)
        del table


if __name__ == "__main__":
    main()
