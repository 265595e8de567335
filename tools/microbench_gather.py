#!/usr/bin/env python3
"""Microbench: dependent-loop gather + record-consumption strategies on the
current device. Decides the traversal body's data layout (PERF_NOTES.md).

Variants, each a while_loop whose body gathers (N, 128) f32 rows from a
54k-row table and consumes them as ~18 (N, 8) block slices (the traversal
body's access pattern), chained so iterations are data-dependent:

  direct      — slice the gathered buffer directly (current traversal)
  barrier     — optimization_barrier after the gather, then slice
  transpose   — transpose to (128, N) once, slices become contiguous rows
  cmajor      — table stored (128, R); per-lane fetch = axis-1 gather
  narrow      — gather only the 64B actually needed by internal nodes
  chains K=2/4 — K independent gather streams interleaved in one body

Usage: python tools/microbench_gather.py [N] [ITERS]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 518400
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    rows = 54722
    recw = 128

    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.random((rows, recw), np.float32))
    table_t = jnp.asarray(np.asarray(table).T.copy())
    idx0 = jnp.asarray(rng.integers(0, rows, n).astype(np.int32))

    def consume_slices(rec, axis0):
        """~18 block slices + reduce to a next-index value (data dependence)."""
        acc = None
        for k in range(18):
            blk = rec[:, 8 * k:8 * (k + 1)] if axis0 else rec[8 * k:8 * (k + 1), :]
            v = jnp.sum(blk, axis=1 if axis0 else 0)
            acc = v if acc is None else acc + v
        return acc

    def run(name, body):
        @jax.jit
        def loop(idx):
            def b(s):
                i, it = s
                return (body(i), it + 1)

            def c(s):
                return s[1] < iters

            out = jax.lax.while_loop(c, b, (idx, 0))
            return out[0]

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
            print(f"{name:24s} {dt*1e3:8.3f} ms/iter  "
                  f"{n/dt/1e6:8.1f} M rows/s", flush=True)
        except Exception as e:  # device faults happen; report and continue
            print(f"{name:24s} FAILED: {type(e).__name__} {str(e)[:100]}",
                  flush=True)

    def direct(i):
        rec = jnp.take(table, i, axis=0)
        acc = consume_slices(rec, True)
        return (i + acc.astype(jnp.int32)) % rows

    def barrier(i):
        rec = jnp.take(table, i, axis=0)
        rec = jax.lax.optimization_barrier(rec)
        acc = consume_slices(rec, True)
        return (i + acc.astype(jnp.int32)) % rows

    def transpose(i):
        rec = jnp.take(table, i, axis=0)
        rec_t = jax.lax.optimization_barrier(rec.T)
        acc = consume_slices(rec_t, False)
        return (i + acc.astype(jnp.int32)) % rows

    def cmajor(i):
        rec = jnp.take(table_t, i, axis=1)  # (128, N)
        acc = consume_slices(rec, False)
        return (i + acc.astype(jnp.int32)) % rows

    def narrow(i):
        rec = jnp.take(table[:, :16], i, axis=0)  # 64B rows
        acc = jnp.sum(rec, axis=1) + jnp.sum(rec[:, :8], axis=1)
        return (i + acc.astype(jnp.int32)) % rows

    def gather_only(i):
        rec = jnp.take(table, i, axis=0)
        return (i + jnp.sum(rec[:, :1], axis=1).astype(jnp.int32)) % rows

    run("gather-only 512B", gather_only)
    run("direct slices", direct)
    run("barrier + slices", barrier)
    run("transpose + slices", transpose)
    run("cmajor axis1 gather", cmajor)
    run("narrow 64B rows", narrow)

    # independent chains: K half/quarter-size streams in one body
    for k in (2, 4):
        m = n // k
        idxs = tuple(jnp.asarray(rng.integers(0, rows, m).astype(np.int32))
                     for _ in range(k))

        @jax.jit
        def loopk(idxs0, _k=k, _m=m):
            def b(s):
                ids, it = s
                new = []
                for i in ids:
                    rec = jnp.take(table, i, axis=0)
                    acc = jnp.sum(rec[:, :8], axis=1)
                    new.append((i + acc.astype(jnp.int32)) % rows)
                return (tuple(new), it + 1)

            def c(s):
                return s[1] < iters

            out = jax.lax.while_loop(c, b, (idxs0, 0))
            return out[0][0]

        try:
            r = loopk(idxs)
            float(jax.device_get(r.ravel()[0]))
            ts = []
            for _ in range(3):
                t0 = time.time()
                r = loopk(idxs)
                float(jax.device_get(r.ravel()[0]))
                ts.append(time.time() - t0)
            dt = min(ts) / iters
            print(f"chains K={k} (total {n}) {dt*1e3:8.3f} ms/iter  "
                  f"{n/dt/1e6:8.1f} M rows/s", flush=True)
        except Exception as e:
            print(f"chains K={k} FAILED: {type(e).__name__} {str(e)[:100]}",
                  flush=True)


if __name__ == "__main__":
    main()


def extra():
    """Second round: where does consumption time go?"""
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 518400
    iters = 16
    rows = 54722
    import jax
    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.random((rows, 128), np.float32))
    idx0 = jnp.asarray(rng.integers(0, rows, n).astype(np.int32))
    w = jnp.asarray(rng.random((128,), np.float32))

    def run(name, body):
        @jax.jit
        def loop(idx):
            def b(s):
                return (body(s[0]), s[1] + 1)
            return jax.lax.while_loop(lambda s: s[1] < iters, b, (idx, 0))[0]
        r = loop(idx0); float(jax.device_get(r.ravel()[0]))
        ts = []
        for _ in range(3):
            t0 = time.time(); r = loop(idx0)
            float(jax.device_get(r.ravel()[0])); ts.append(time.time() - t0)
        dt = min(ts) / iters
        print(f"{name:28s} {dt*1e3:8.3f} ms/iter {n/dt/1e6:8.1f} M rows/s", flush=True)

    def fused_weighted(i):
        rec = jnp.take(table, i, axis=0)
        acc = jnp.sum(rec * w[None, :], axis=1)
        return (i + acc.astype(jnp.int32)) % rows

    def slices_no_reduce(i):
        rec = jnp.take(table, i, axis=0)
        acc = rec[:, 0:8]
        for k in range(1, 16):
            acc = acc + rec[:, 8 * k:8 * (k + 1)]
        return (i + jnp.sum(acc, axis=1).astype(jnp.int32)) % rows

    def wide_elementwise(i):
        # 18 full-width elementwise passes, one reduce at the end
        rec = jnp.take(table, i, axis=0)
        acc = rec
        for k in range(17):
            acc = acc * 1.0000001 + rec
        return (i + jnp.sum(acc[:, :1], axis=1).astype(jnp.int32)) % rows

    def reduce8_16x(i):
        # 16 separate (N,8)->(N,) reductions on ONE slice (VPU minor-dim cost)
        rec = jnp.take(table, i, axis=0)
        blk = rec[:, 0:8]
        acc = None
        for k in range(16):
            v = jnp.sum(blk * (1.0 + k), axis=1)
            acc = v if acc is None else acc + v
        return (i + acc.astype(jnp.int32)) % rows

    def slab_like(i):
        # the actual slab-test shape: 6 slices, mins/maxes, one argmin-ish
        rec = jnp.take(table, i, axis=0)
        tx0 = rec[:, 0:8]; tx1 = rec[:, 24:32]
        ty0 = rec[:, 8:16]; ty1 = rec[:, 32:40]
        tz0 = rec[:, 16:24]; tz1 = rec[:, 40:48]
        tn = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
                         jnp.minimum(tz0, tz1))
        tf = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
                         jnp.maximum(tz0, tz1))
        hit = tn <= tf
        key = jnp.where(hit, tn, 3e38)
        m = jnp.min(key, axis=1)
        return (i + m.astype(jnp.int32)) % rows

    run("fused weighted 1-pass", fused_weighted)
    run("slices no-reduce", slices_no_reduce)
    run("wide elementwise x18", wide_elementwise)
    run("reduce8 x16 one slice", reduce8_16x)
    run("slab-like body", slab_like)


if __name__ == "__main__" and os.environ.get("EXTRA"):
    extra()
