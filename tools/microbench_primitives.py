#!/usr/bin/env python3
"""Microbenchmarks for the primitives a dense/binned traversal would build on.

The gather-driven lockstep traversal runs at ~40M gathered rows/s end-to-end
(tools/perf_probe.py), far from both HBM streaming (~800 GB/s) and VPU f32
peak (~2 TFLOP/s 8x128 @ ~940MHz). Candidate redesigns (ray binning by
cluster, dense ray-x-cluster culling, sort-based queues) each hinge on one
primitive being fast. Measure them ALL on the real device before designing:

  sort        - jnp.sort / argsort of uint32 keys (queue building)
  cumsum      - int32 prefix sums (stream compaction)
  dense_slab  - (N, M) broadcast AABB slab test (dense culling)
  gather_rand - random-row gather (the current traversal's inner op)
  gather_sort - same indices sorted (does XLA exploit locality?)
  fused_flops - long fused elementwise chain (VPU f32 ceiling)
  take_pairs  - expand (N,S) hit mask to pair list via cumsum+scatter

Timing uses tiny-readback sync (block_until_ready unreliable — PERF_NOTES.md).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, *args, reps=5):
    r = fn(*args)
    _ = float(np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[0])  # sync
    ts = []
    for _i in range(reps):
        t0 = time.perf_counter()
        r = fn(*args)
        _ = float(np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[0])
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    global jax
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    print(f"platform: {jax.devices()[0].platform}", flush=True)

    # --- sort / argsort ---
    for n in (1 << 21, 1 << 23):
        keys = jnp.asarray(rng.integers(0, 1 << 30, n, dtype=np.uint32))
        t = timed(jax.jit(jnp.sort), keys)
        print(f"sort u32 n={n>>20}M: {t*1e3:7.2f} ms ({n/t/1e6:.0f} M/s)")
        t = timed(jax.jit(jnp.argsort), keys)
        print(f"argsort u32 n={n>>20}M: {t*1e3:7.2f} ms ({n/t/1e6:.0f} M/s)")

    # --- cumsum int32 ---
    for n in (1 << 24,):
        x = jnp.ones((n,), jnp.int32)
        t = timed(jax.jit(jnp.cumsum), x)
        print(f"cumsum i32 n={n>>20}M: {t*1e3:7.2f} ms ({n/t/1e9:.2f} G/s)")

    # --- dense slab test (N, M) ---
    @jax.jit
    def slab(o, inv, lo, hi):
        # (N,1,3) vs (1,M,3): 6 mul-sub + 3 min + 3 max + reduce
        t0 = (lo[None, :, :] - o[:, None, :]) * inv[:, None, :]
        t1 = (hi[None, :, :] - o[:, None, :]) * inv[:, None, :]
        tn = jnp.max(jnp.minimum(t0, t1), axis=-1)
        tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
        return (tn <= tf).astype(jnp.int32)

    for (n, m) in ((1 << 19, 256), (1 << 19, 1024), (1 << 21, 256)):
        o = jnp.asarray(rng.random((n, 3), np.float32))
        inv = jnp.asarray(rng.random((n, 3), np.float32) + 0.5)
        lo = jnp.asarray(rng.random((m, 3), np.float32))
        hi = lo + 0.1
        t = timed(slab, o, inv, lo, hi)
        pairs = n * m
        print(f"dense_slab N={n>>10}k M={m}: {t*1e3:7.2f} ms "
              f"({pairs/t/1e9:.1f} G pair/s, ~{pairs*21/t/1e12:.2f} TFLOP/s)")

    # --- gathers: random vs sorted indices, narrow vs wide rows ---
    for rows, width in ((1 << 16, 128), (1 << 16, 16)):
        table = jnp.asarray(rng.random((rows, width), np.float32))
        for n in (1 << 21,):
            idx_r = jnp.asarray(rng.integers(0, rows, n, dtype=np.int32))
            idx_s = jnp.sort(idx_r)
            g = jax.jit(lambda tb, ix: jnp.take(tb, ix, axis=0).sum(axis=1))
            tr = timed(g, table, idx_r)
            ts = timed(g, table, idx_s)
            print(f"gather rows={rows>>10}k w={width} n={n>>20}M: "
                  f"rand {tr*1e3:7.2f} ms ({n/tr/1e6:.0f} M row/s)  "
                  f"sorted {ts*1e3:7.2f} ms ({n/ts/1e6:.0f} M row/s)")

    # --- VPU f32 ceiling: fused mul-add chain ---
    @jax.jit
    def chain(x):
        for _ in range(64):
            x = x * 1.000001 + 0.000001
        return x

    for n in (1 << 24,):
        x = jnp.ones((n,), jnp.float32)
        t = timed(chain, x)
        print(f"fused 64x fma n={n>>20}M: {t*1e3:7.2f} ms "
              f"({n*128/t/1e12:.2f} TFLOP/s)")

    # --- pair expansion: (N,S) bools -> compacted pair list ---
    @jax.jit
    def expand(mask):
        n, s_dim = mask.shape
        flat = mask.reshape(-1)
        pos = jnp.cumsum(flat) - flat  # exclusive scan
        cap = flat.shape[0]
        out = jnp.zeros((cap,), jnp.int32).at[
            jnp.where(flat > 0, pos, cap - 1)].set(
            jnp.arange(cap, dtype=jnp.int32), mode="drop")
        return out

    for (n, s_dim) in ((1 << 19, 64), (1 << 21, 64)):
        mask = jnp.asarray((rng.random((n, s_dim)) < 0.06).astype(np.int32))
        t = timed(expand, mask)
        print(f"pair_expand N={n>>10}k S={s_dim}: {t*1e3:7.2f} ms "
              f"({n*s_dim/t/1e9:.2f} G elem/s)")


if __name__ == "__main__":
    main()
