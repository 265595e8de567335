#!/usr/bin/env python3
"""Honest budget decomposition of the per-ray W32 traversal at production
shapes: how much of the measured block time is (a) the raw gather floor,
(b) body math, (c) lockstep dead lanes, (d) compaction boundaries, and
(e) while-loop fixed cost. Round-3's numbers for these came from
single-sync timings that carry the ~35-73 ms RTT floor (tools/_timing.py);
this probe re-derives them with enqueued timing so the refill /
persistent-lanes decision (PERF_NOTES round-2 backlog #3) rests on real
numbers.

Usage: python tools/probe_traversal_budget.py [N]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tools._timing import timed


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 518400

    from dxrpathtracer_tpu.accel import traverse as trav
    from dxrpathtracer_tpu.app.session import RenderSession
    from dxrpathtracer_tpu.app.settings import AppSettings, Scenes
    from dxrpathtracer_tpu.core.constants import FP32Max
    from dxrpathtracer_tpu.render.integrator import (_packet_tile_dims,
                                                     _tile_order, raygen)
    from dxrpathtracer_tpu.render.swraster import raster_closest_hit

    sess = RenderSession(settings=AppSettings(current_scene=Scenes.Sponza),
                         width=1920, height=1080)
    bvh = sess.bvh_ray
    print(f"table rows {bvh.num_rows} width {bvh.width}")

    # raw gather floor: dependent-chain row fetch on the SAME table
    nxt = jnp.asarray(np.random.default_rng(0).integers(
        0, bvh.num_rows, bvh.num_rows).astype(np.int32))

    def chain(row0):
        def body(s):
            row, acc, it = s
            rec = jnp.take(bvh.table, row, axis=0, mode="clip")
            acc = acc + rec[:, 1]
            row = jnp.take(nxt, row) ^ (it & 1)
            return row, acc, it + 1
        out = jax.lax.while_loop(lambda s: s[2] < 20, body,
                                 (row0, jnp.zeros_like(row0, jnp.float32),
                                  jnp.int32(0)))
        return out[1]

    chain_j = jax.jit(chain)
    rng = np.random.default_rng(1)
    row0 = jnp.asarray(rng.integers(0, bvh.num_rows, n).astype(np.int32))
    t_chain = timed(chain_j, row0)
    print(f"dependent-chain gather: {t_chain*1e3:.2f} ms / {20*n/1e6:.1f}M "
          f"rows = {20*n/t_chain/1e6:.0f} M rows/s", flush=True)

    # production-like bounce rays from raster primaries
    slab_h = sess._slab_h
    frame = sess.frame_constants(0)
    o, d, length, _ = raygen(sess.settings, frame, 1920, slab_h,
                             row_offset=0, total_height=1080)
    ty, tx = _packet_tile_dims(slab_h, 1920)
    o_t = _tile_order(o, slab_h, 1920, ty, tx)
    d_t = _tile_order(d, slab_h, 1920, ty, tx)
    l_t = _tile_order(length, slab_h, 1920, ty, tx)
    rec = raster_closest_hit(sess._raster_slabs[0], o_t, d_t, 0.0, l_t, None)
    hit = np.asarray(rec.hit)
    pos = np.asarray(o_t) + np.asarray(d_t) * (np.asarray(rec.t) * 0.999)[:, None]
    z = rng.uniform(0, 1, n)
    phi = rng.uniform(0, 2 * np.pi, n)
    r = np.sqrt(z)
    bd = np.stack([r * np.cos(phi), r * np.sin(phi),
                   np.sqrt(np.maximum(1 - z, 0))], -1)
    up = rng.normal(size=(n, 3))
    bd = bd + 0.3 * up / np.linalg.norm(up, axis=1, keepdims=True)
    bd /= np.linalg.norm(bd, axis=1, keepdims=True)
    o_b = jnp.asarray(pos[:n].astype(np.float32))
    d_b = jnp.asarray(bd.astype(np.float32))
    act = jnp.asarray(hit[:n])
    tmin = jnp.full((n,), 1e-5, jnp.float32)
    tmax = jnp.full((n,), FP32Max, jnp.float32)

    for label, env in [
        ("production (8 phases, floor 2048)", {}),
        ("no compaction (1 phase)",
         {"DXRPT_MAX_COMPACT_PHASES": "0"}),
        ("4 phases, floor 8192",
         {"DXRPT_MAX_COMPACT_PHASES": "4", "DXRPT_MIN_COMPACT_SIZE": "8192"}),
        ("12 phases, floor 1024",
         {"DXRPT_MAX_COMPACT_PHASES": "12",
          "DXRPT_MIN_COMPACT_SIZE": "1024"}),
        ("unroll 1", {"DXRPT_TRAVERSE_UNROLL": "1"}),
        ("unroll 4", {"DXRPT_TRAVERSE_UNROLL": "4"}),
    ]:
        old = {k: os.environ.get(k) for k in env}
        os.environ.update(env)
        try:
            fn = jax.jit(lambda o=o_b, d=d_b: trav.closest_hit(
                bvh, o, d, tmin, tmax, act))
            t = timed(fn)
            print(f"bounce closest {label:34s} {t*1e3:8.2f} ms", flush=True)
        finally:
            for k, v in old.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v


if __name__ == "__main__":
    main()
