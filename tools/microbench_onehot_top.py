#!/usr/bin/env python3
"""Can the MXU serve tree-top record fetches cheaper than XLA's gather?

Per-ray traversal cost = gathered rows x ~6.9 ns (PERF_NOTES.md): the gather
is row-LATENCY bound, not bandwidth bound (518k x 512 B rows move at only
~60 GB/s). But a large fraction of gathered rows are the SAME few tree-top
rows (root + level-1 + pops back into them). Those could be served exactly by
an int8 one-hot matmul on the MXU:

    rec_bytes = onehot_i8(row, TOP) @ table_bytes_i8[TOP rows]  -> s32, exact

(s8 x s8 -> s32 is exact selection for one-hot weights; 4 byte-planes
reassemble the original f32/i32 bits, so codes and triangle data survive.)

The hybrid only wins if gather(row clipped: top lanes -> row 0) is actually
FASTER than gather(random rows) — i.e., XLA's gather exploits duplicate
indices. This microbench measures:
  1. gather, all-random rows            (baseline: today's cost)
  2. gather, X% of lanes clipped to 0   (the hybrid's residual gather)
  3. one-hot construct + s8 matmul + byte reassembly + select merge
     (the hybrid's added cost)

Timing protocol per tpu-platform-rules: slice-on-device 4-byte readback,
several invocations per sync, interleaved repeats.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    N = 518_400
    ROWS = 32_768
    REC = 128  # f32 words = 512 B
    TOP = 128

    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (ROWS, REC), jnp.float32)
    # int8 byte view of the top rows: (TOP, REC*4)
    table_np = np.asarray(table[:TOP])
    table_bytes = jnp.asarray(table_np.view(np.int8).reshape(TOP, REC * 4))

    rng = np.random.default_rng(7)
    rand_rows = rng.integers(0, ROWS, size=N).astype(np.int32)
    # realistic top-row ids: skewed toward low ids
    top_ids = (rng.random(N) ** 2 * TOP).astype(np.int32)

    def timed(fn, *args, reps=12, inner=4):
        f = jax.jit(fn)
        out = f(*args)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            for _ in range(inner):
                out = f(*args)
            # tiny readback sync (block_until_ready unreliable on axon)
            _ = float(np.asarray(jax.device_get(out.ravel()[:1]))[0])
            best = min(best, (time.time() - t0) / inner)
        return best

    dev_rand = jax.device_put(jnp.asarray(rand_rows))

    def g(rowv):
        r = jnp.take(table, rowv, axis=0)
        return r.sum(axis=1)  # force materialization, cheap reduce

    t_rand = timed(g, dev_rand)
    print(f"gather random             : {t_rand*1e3:7.2f} ms  "
          f"({N/t_rand/1e6:6.1f} M rows/s)")

    for frac in (0.25, 0.5, 1.0):
        mask = rng.random(N) < frac
        rows_m = np.where(mask, 0, rand_rows).astype(np.int32)
        t_m = timed(g, jax.device_put(jnp.asarray(rows_m)))
        print(f"gather {int(frac*100):3d}% clipped to 0 : {t_m*1e3:7.2f} ms")

    # sorted-duplicates variant: clip top lanes to row 0 but ALSO test a
    # gather where duplicate rows are contiguous (cache-friendliness probe)
    rows_sorted = np.sort(rand_rows)
    t_s = timed(g, jax.device_put(jnp.asarray(rows_sorted)))
    print(f"gather random SORTED      : {t_s*1e3:7.2f} ms")

    # ---- one-hot s8 matmul fetch of TOP rows ----
    dev_top = jax.device_put(jnp.asarray(top_ids))

    def onehot_fetch(rowv):
        oh = (rowv[:, None] == jnp.arange(TOP, dtype=jnp.int32)[None, :])
        oh8 = oh.astype(jnp.int8)
        rec_b = jax.lax.dot_general(
            oh8, table_bytes, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)  # (N, REC*4) s32 in [-128,127]
        # reassemble 4 bytes -> i32 -> f32 bits
        b = rec_b.reshape(N, REC, 4)
        w = (b[..., 0] & 0xFF) | ((b[..., 1] & 0xFF) << 8) \
            | ((b[..., 2] & 0xFF) << 16) | (b[..., 3] << 24)
        rec = jax.lax.bitcast_convert_type(w, jnp.float32)
        return rec.sum(axis=1)

    t_oh = timed(onehot_fetch, dev_top)
    print(f"one-hot s8 matmul TOP={TOP:4d}: {t_oh*1e3:7.2f} ms")

    # correctness of the byte reassembly
    got = np.asarray(jax.jit(onehot_fetch)(dev_top))
    want = table_np[np.asarray(top_ids)].sum(axis=1)
    err = np.abs(got - want).max()
    print(f"one-hot exactness: max |err| = {err:.3e}")

    # ---- full hybrid merge at 25% top fraction ----
    mask25 = rng.random(N) < 0.25
    rows_h = np.where(mask25, top_ids, rand_rows).astype(np.int32)
    dev_h = jax.device_put(jnp.asarray(rows_h))

    def hybrid(rowv):
        in_top = rowv < TOP
        r_gather = jnp.take(table, jnp.where(in_top, 0, rowv), axis=0)
        oh8 = ((rowv[:, None] == jnp.arange(TOP, dtype=jnp.int32)[None, :])
               ).astype(jnp.int8)
        rec_b = jax.lax.dot_general(
            oh8, table_bytes, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        b = rec_b.reshape(N, REC, 4)
        w = (b[..., 0] & 0xFF) | ((b[..., 1] & 0xFF) << 8) \
            | ((b[..., 2] & 0xFF) << 16) | (b[..., 3] << 24)
        r_top = jax.lax.bitcast_convert_type(w, jnp.float32)
        rec = jnp.where(in_top[:, None], r_top, r_gather)
        return rec.sum(axis=1)

    t_hy = timed(hybrid, dev_h)
    t_base = timed(g, dev_h)
    print(f"hybrid (25% top)          : {t_hy*1e3:7.2f} ms  vs plain gather "
          f"{t_base*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
