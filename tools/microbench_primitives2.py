#!/usr/bin/env python3
"""Round 2 of primitive microbenchmarks, driven by v1's surprises:

v1 findings (tools/microbench_primitives.py, uncontended):
  - jnp.sort/argsort: ~8 M keys/s. Sort-based binning is DEAD on this stack.
  - jnp.cumsum (1D int32): ~9 M elem/s (!!). The traversal's compaction
    cumsum at 518k lanes costs ~50 ms per phase boundary.
  - dense (N,1,3)x(1,M,3) slab test: ~10 M pairs/s — the (...,3) minor dim
    is catastrophic (materialized/padded (N,M,3) intermediates).

v2 measures the TPU-native replacements:
  - scan_mm: exclusive prefix sum via (N/B,B) @ lower-triangular(B,B) on the
    MXU + tiny inter-block scan — the cumsum replacement.
  - cumsum_2d: cumsum along minor/major axes of a reshaped 2D array.
  - slab_soa: the same dense slab test with per-component (N,M) arrays.
  - seg_reduce_mm: per-block reduce via matmul (for binned accumulation).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sync(r):
    """4-byte sync: JAX-slice THEN transfer. np.asarray(full array) pulls the
    whole buffer through the ~40 MB/s tunnel and was the dominant cost of
    every v1 measurement — v1's numbers are readback times, not op times."""
    import jax
    leaf = jax.tree_util.tree_leaves(r)[0]
    return float(leaf.ravel()[0])


def timed(fn, *args, reps=3, inner=8):
    """Enqueue `inner` async invocations, sync once: amortizes the ~73 ms
    readback RTT to RTT/inner. The device drains its queue in order, so
    syncing the last output fences them all."""
    _sync(fn(*args))
    ts = []
    for _i in range(reps):
        t0 = time.perf_counter()
        out = None
        for _k in range(inner):
            out = fn(*args)
        _sync(out)
        ts.append((time.perf_counter() - t0) / inner)
    return min(ts)


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial

    rng = np.random.default_rng(0)
    print(f"platform: {jax.devices()[0].platform}", flush=True)

    # --- matmul-based exclusive scan ---
    B = 128

    @jax.jit
    def scan_mm(x):
        n = x.shape[0]
        blocks = x.reshape(n // B, B)
        tri = jnp.tril(jnp.ones((B, B), jnp.float32), k=-1)  # strict lower
        intra = jax.lax.dot_general(
            blocks, tri, (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST)  # (n//B, B) exclusive intra
        block_tot = intra[:, -1] + blocks[:, -1]
        # inter-block exclusive scan (n//B elements; small cumsum)
        offs = jnp.cumsum(block_tot) - block_tot
        return (intra + offs[:, None]).reshape(n)

    @jax.jit
    def scan_ref(x):
        return jnp.cumsum(x) - x

    for n in (1 << 19, 1 << 22):
        x = jnp.asarray(rng.integers(0, 2, n).astype(np.float32))
        a = scan_mm(x)
        b = scan_ref(x)
        ok = bool(jnp.max(jnp.abs(a - b)) == 0)
        t1 = timed(scan_mm, x)
        t2 = timed(scan_ref, x)
        print(f"scan n={n>>10}k: mm {t1*1e3:7.2f} ms ({n/t1/1e9:.2f} G/s) "
              f"cumsum {t2*1e3:7.2f} ms ({n/t2/1e9:.3f} G/s) match={ok}")

    # --- cumsum along 2D axes ---
    n = 1 << 22
    x2 = jnp.asarray(rng.integers(0, 2, n).astype(np.int32)).reshape(-1, 128)
    t = timed(jax.jit(lambda a: jnp.cumsum(a, axis=1)), x2)
    print(f"cumsum2d minor (32k,128): {t*1e3:7.2f} ms ({n/t/1e9:.2f} G/s)")
    t = timed(jax.jit(lambda a: jnp.cumsum(a, axis=0)), x2)
    print(f"cumsum2d major (32k,128): {t*1e3:7.2f} ms ({n/t/1e9:.2f} G/s)")

    # --- SoA dense slab test ---
    @jax.jit
    def slab_soa(o, inv, lo, hi):
        tn = None
        tf = None
        for c in range(3):
            t0 = (lo[c][None, :] - o[c][:, None]) * inv[c][:, None]
            t1 = (hi[c][None, :] - o[c][:, None]) * inv[c][:, None]
            lo_c = jnp.minimum(t0, t1)
            hi_c = jnp.maximum(t0, t1)
            tn = lo_c if tn is None else jnp.maximum(tn, lo_c)
            tf = hi_c if tf is None else jnp.minimum(tf, hi_c)
        return (tn <= tf).astype(jnp.int32)

    for (n, m) in ((1 << 19, 256), (1 << 19, 1024)):
        o = [jnp.asarray(rng.random(n, np.float32)) for _ in range(3)]
        inv = [jnp.asarray(rng.random(n, np.float32) + 0.5) for _ in range(3)]
        lo = [jnp.asarray(rng.random(m, np.float32)) for _ in range(3)]
        hi = [l + 0.1 for l in lo]
        t = timed(slab_soa, o, inv, lo, hi)
        pairs = n * m
        print(f"slab_soa N={n>>10}k M={m}: {t*1e3:7.2f} ms "
              f"({pairs/t/1e9:.1f} G pair/s)")

    # --- MXU throughput sanity: (N,128) @ (128,128) f32 ---
    for n in (1 << 19,):
        a = jnp.asarray(rng.random((n, 128), np.float32))
        w = jnp.asarray(rng.random((128, 128), np.float32))
        f = jax.jit(partial(jax.lax.dot_general,
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            precision=jax.lax.Precision.HIGHEST))
        t = timed(f, a, w)
        fl = n * 128 * 128 * 2
        print(f"matmul ({n>>10}k,128)@(128,128) f32: {t*1e3:7.2f} ms "
              f"({fl/t/1e12:.1f} TFLOP/s)")


if __name__ == "__main__":
    main()
