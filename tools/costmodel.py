#!/usr/bin/env python3
"""Honest cost model of the traversal's building blocks (v3 harness).

Measures, with amortized 4-byte syncs (see microbench_primitives2.timed):
  launch     - per-executable-launch overhead (empty-ish program)
  gather     - dependent-loop gather rows/s at several N (the inner op)
  while_iter - while_loop iteration overhead with a trivial body at several N
  body_iter  - the REAL traversal body per-iteration cost at several N
               (fixed row, no termination — isolates body from tree shape)

Everything earlier measured with full-array np.asarray syncs is invalid
(that's a ~40 MB/s tunnel readback, not compute).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.microbench_primitives2 import timed, _sync  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from dxrpathtracer_tpu.app.session import RenderSession
    from dxrpathtracer_tpu.app.settings import AppSettings, Scenes
    from dxrpathtracer_tpu.accel import traverse as T

    rng = np.random.default_rng(0)
    print(f"platform: {jax.devices()[0].platform}", flush=True)

    # --- launch overhead ---
    f_tiny = jax.jit(lambda x: x + 1.0)
    x_tiny = jnp.ones((128,), jnp.float32)
    t = timed(f_tiny, x_tiny, inner=16)
    print(f"launch overhead: {t*1e3:.2f} ms", flush=True)

    # --- dependent gather chain (64 steps inside ONE program) ---
    sess = RenderSession(settings=AppSettings(current_scene=Scenes.Sponza),
                         width=8, height=8)
    bvh = sess.bvh
    table = bvh.table  # (rows, 128) f32
    rows_n = bvh.num_rows
    STEPS = 64

    def make_gather_loop(n):
        @jax.jit
        def run(idx0):
            def body(s):
                idx, it = s
                rec = jnp.take(table, idx, axis=0, mode="clip")
                nxt = jnp.abs(T._bitcast_i32(rec[:, 48])) % rows_n
                return (nxt, it + 1)
            idx, _ = jax.lax.while_loop(lambda s: s[1] < STEPS, body,
                                        (idx0, jnp.int32(0)))
            return idx
        return run

    for n in (32768, 131072, 524288):
        idx0 = jnp.asarray(rng.integers(0, rows_n, n, dtype=np.int32))
        f = make_gather_loop(n)
        t = timed(f, idx0, inner=4)
        print(f"gather-loop n={n>>10}k: {t/STEPS*1e6:8.1f} us/iter "
              f"({n*STEPS/t/1e6:.0f} M rows/s)", flush=True)

    # --- while_loop with trivial body ---
    def make_trivial_loop(n):
        @jax.jit
        def run(x):
            def body(s):
                v, it = s
                return (v * 1.000001 + 1e-9, it + 1)
            v, _ = jax.lax.while_loop(lambda s: s[1] < STEPS, body,
                                      (x, jnp.int32(0)))
            return v
        return run

    for n in (32768, 524288):
        x = jnp.ones((n,), jnp.float32)
        f = make_trivial_loop(n)
        t = timed(f, x, inner=4)
        print(f"trivial-loop n={n>>10}k: {t/STEPS*1e6:8.1f} us/iter", flush=True)

    # Simpler honest probe: time full closest_hit at several N on REAL rays
    frame = sess.frame_constants(0)
    for n in (32768, 131072, 524288):
        o = jnp.asarray(np.tile(np.array([[0.0, 2.0, -8.0]], np.float32),
                                (n, 1)))
        d = rng.normal(size=(n, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        d = jnp.asarray(d)
        t_min = jnp.full((n,), 1e-3, jnp.float32)
        t_max = jnp.full((n,), 3e38, jnp.float32)

        f = jax.jit(lambda o, d, tn, tx: T.closest_hit(
            bvh, o, d, tn, tx, jnp.ones((o.shape[0],), bool)).t)
        t = timed(f, o, d, t_min, t_max, inner=2)
        st = jax.jit(lambda o, d, tn, tx: T._traverse(
            bvh, o, d, tn, tx, jnp.ones((o.shape[0],), bool), None,
            False, stats=True)[1])(o, d, t_min, t_max)
        pi = np.asarray(st["phase_iters"])
        steps = np.diff(np.concatenate([[0], pi]))
        sizes = [int(s) for s in st["sizes"]]
        rows = (np.asarray(sizes) * steps).sum()
        print(f"closest_hit n={n>>10}k omni: {t*1e3:8.2f} ms  iters={pi[-1]} "
              f"rows={rows/1e6:.1f}M ({rows/t/1e6:.0f} M rows/s)", flush=True)


if __name__ == "__main__":
    main()
