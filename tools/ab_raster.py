#!/usr/bin/env python3
"""A/B: software-raster primary visibility vs packet BVH traversal on the
production bench rays (in-process, interleaved — the only trustworthy
timing protocol on the tunneled v5e; PERF_NOTES.md).

Also reports the raster's internal phase costs (pair count, gather bytes)
and sweeps the tile shape: the session's packet tiling picks (ty, tx) by
slab divisibility — (2, 64) at 1080p slabs — while the pair count varies
~2x with tile aspect.

Usage: python tools/ab_raster.py [WIDTH HEIGHT]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def sync(x):
    jax.tree_util.tree_leaves(x)[0].block_until_ready()
    float(np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0]))


def timeit(fn, *args, reps=8, trials=3):
    """Enqueue `reps` invocations per sync: a single dispatch+readback pays
    the ~35-73 ms tunnel RTT floor and measures NOTHING smaller
    (PERF_NOTES.md round-2 'honest timing'; tools/microbench_primitives2)."""
    sync(fn(*args))  # compile + warm
    best = float("inf")
    for _ in range(trials):
        t0 = time.time()
        outs = [fn(*args) for _ in range(reps)]
        sync(outs[-1])
        best = min(best, (time.time() - t0) / reps)
    return best


def main():
    width = int(sys.argv[1]) if len(sys.argv) > 1 else 1920
    height = int(sys.argv[2]) if len(sys.argv) > 2 else 1080
    slab_h = int(sys.argv[3]) if len(sys.argv) > 3 else 216

    from dxrpathtracer_tpu.accel.history import build_tri_table
    from dxrpathtracer_tpu.app.session import RenderSession
    from dxrpathtracer_tpu.app.settings import AppSettings, Scenes
    from dxrpathtracer_tpu.render import swraster
    from dxrpathtracer_tpu.render.integrator import (_packet_tile_dims,
                                                     _tile_order, raygen)
    from dxrpathtracer_tpu.accel.packet import packet_closest_hit

    # PRODUCTION geometry: the full-height camera; rays/bins for ONE slab
    # (a 1920x216 *camera* is a letterbox with a pathological tile-depth
    # distribution — the first version of this tool measured that instead).
    sess = RenderSession(settings=AppSettings(current_scene=Scenes.Sponza),
                         width=width, height=height)
    frame = sess.frame_constants(0)
    o, d, length, _pix = raygen(sess.settings, frame, width, slab_h,
                                row_offset=0, total_height=height)
    pos = np.asarray(sess.scene_host.positions)
    tri = np.asarray(sess.scene_host.tri_idx)
    tri_table = jax.device_put(build_tri_table(pos, tri))
    vp = np.asarray(sess.camera.view_projection(), np.float64)
    near = float(sess.camera.near_clip)
    bboxes = swraster.project_tri_bboxes(pos, tri, vp, near, width, height)

    shapes = [(_packet_tile_dims(slab_h, width))]
    for cand in ((8, 16), (4, 32), (16, 8), (2, 64)):
        if slab_h % cand[0] == 0 and width % cand[1] == 0 \
                and cand not in shapes:
            shapes.append(cand)

    # packet baseline on the session's tiling
    ty0, tx0 = shapes[0]
    o_t = _tile_order(o, slab_h, width, ty0, tx0)
    d_t = _tile_order(d, slab_h, width, ty0, tx0)
    l_t = _tile_order(length, slab_h, width, ty0, tx0)

    pk = jax.jit(lambda oo, dd, ll: packet_closest_hit(
        sess.bvh, oo, dd, jnp.zeros_like(ll), ll))
    t_pk = timeit(pk, o_t, d_t, l_t)
    print(f"packet closest ({ty0}x{tx0} tiles): {t_pk*1e3:.1f} ms", flush=True)

    for ty, tx in shapes:
        o_t = _tile_order(o, slab_h, width, ty, tx)
        d_t = _tile_order(d, slab_h, width, ty, tx)
        l_t = _tile_order(length, slab_h, width, ty, tx)
        t0 = time.time()
        bins, p_ovf = swraster.build_raster_bins(
            pos, tri, vp, near, width, height, slab_h, 0, ty, tx, tri_table,
            bboxes=bboxes)
        t_host = time.time() - t0
        rc = jax.jit(lambda oo, dd, ll, b=bins: swraster.raster_closest_hit(
            b, oo, dd, 0.0, ll, None))
        t_r = timeit(rc, o_t, d_t, l_t)
        n_dense = int((np.asarray(bins.dense_tbl) >= 0).sum())
        print(f"raster {ty:2d}x{tx:<3d}: {t_r*1e3:6.1f} ms  "
              f"dense={n_dense} ovf={p_ovf} pad={bins.pair_tri.shape[0]} "
              f"host-bin {t_host:.2f}s  ({t_pk/t_r:.2f}x vs packet)",
              flush=True)

        # parity spot check on the first shape
        if (ty, tx) == shapes[0]:
            rr = rc(o_t, d_t, l_t)
            bb = pk(o_t, d_t, l_t)
            mism = int((np.asarray(rr.tri_id) != np.asarray(bb.tri_id)).sum())
            print(f"  parity vs packet: {mism}/{len(np.asarray(rr.tri_id))} "
                  f"tri mismatches", flush=True)


if __name__ == "__main__":
    main()
