#!/usr/bin/env python3
"""Ablation timing of the real traversal body at fixed N (no termination):
which part of the per-iteration cost is gather / slab+argmin / leaf / stack?

Usage: python tools/ablate_traverse.py [N] [ITERS]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 518400
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    import jax
    import jax.numpy as jnp
    from dxrpathtracer_tpu.app.session import RenderSession
    from dxrpathtracer_tpu.app.settings import AppSettings, Scenes
    from dxrpathtracer_tpu.accel.lbvh import LEAF_SIZE
    from dxrpathtracer_tpu.accel.traverse import _argmin8_block, _bitcast_i32, _intersect_leaf

    sess = RenderSession(settings=AppSettings(current_scene=Scenes.Sponza),
                         width=8, height=8)
    bvh = sess.bvh
    print(f"rows={bvh.num_rows} N={n} iters={iters}", flush=True)

    rng = np.random.default_rng(0)
    BIG = jnp.float32(3e38)
    rows0 = jnp.asarray(rng.integers(0, bvh.num_rows, n).astype(np.int32))
    o = jnp.asarray(rng.random((n, 3), np.float32) * 20 - 10)
    d = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    stack_depth = bvh.max_depth + 2
    levels = jnp.arange(stack_depth, dtype=jnp.int32)[:, None]

    def run(name, body):
        @jax.jit
        def loop(r):
            st = (r, jnp.zeros((n,), jnp.float32) + 100.0,
                  jnp.zeros((stack_depth, n), jnp.int32),
                  jnp.zeros((n,), jnp.int32), 0)

            def b(s):
                return body(*s[:4]) + (s[4] + 1,)

            return jax.lax.while_loop(lambda s: s[4] < iters, b, st)[0]

        r = loop(rows0)
        float(jax.device_get(r.ravel()[0]))
        ts = []
        for _ in range(3):
            t0 = time.time()
            r = loop(rows0)
            float(jax.device_get(r.ravel()[0]))
            ts.append(time.time() - t0)
        dt = min(ts) / iters
        print(f"{name:28s} {dt*1e3:8.3f} ms/iter", flush=True)

    ox, oy, oz = o[:, 0], o[:, 1], o[:, 2]
    dx, dy, dz = d[:, 0], d[:, 1], d[:, 2]
    ivx, ivy, ivz = 1.0 / dx, 1.0 / dy, 1.0 / dz
    tmin = jnp.zeros((n,), jnp.float32)

    def gather(row):
        return jnp.take(bvh.table, row % bvh.num_rows, axis=0, mode="clip")

    def slab_argmin(rec, best_t):
        tx0 = (rec[:, 0:8] - ox[:, None]) * ivx[:, None]
        tx1 = (rec[:, 24:32] - ox[:, None]) * ivx[:, None]
        ty0 = (rec[:, 8:16] - oy[:, None]) * ivy[:, None]
        ty1 = (rec[:, 32:40] - oy[:, None]) * ivy[:, None]
        tz0 = (rec[:, 16:24] - oz[:, None]) * ivz[:, None]
        tz1 = (rec[:, 40:48] - oz[:, None]) * ivz[:, None]
        tn8 = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
                          jnp.maximum(jnp.minimum(tz0, tz1), tmin[:, None]))
        tf8 = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
                          jnp.minimum(jnp.maximum(tz0, tz1), best_t[:, None]))
        valid8 = rec[:, 0:8] <= rec[:, 24:32]
        hit8 = valid8 & (tn8 <= tf8)
        codes8 = _bitcast_i32(rec[:, 48:56])
        keys8 = jnp.where(hit8, tn8, BIG)
        slot_pow2 = jnp.int32(1) << jnp.arange(8, dtype=jnp.int32)[None, :]
        hm = jnp.sum(jnp.where(hit8, slot_pow2, 0), axis=1)
        nk, nc, nb = _argmin8_block(keys8, codes8)
        return nk, nc, nb, hm

    def leaf(rec, best_t):
        bt, btri, bu, bv = _intersect_leaf(
            bvh, rec, (ox, oy, oz), (dx, dy, dz), tmin,
            jnp.ones((n,), bool), (best_t, jnp.full((n,), -1, jnp.int32),
                                   jnp.zeros((n,), jnp.float32),
                                   jnp.zeros((n,), jnp.float32)), None)
        return bt

    def v_gather_only(row, bt, snode, sp):
        rec = gather(row)
        return (row + _bitcast_i32(rec[:, :1]).sum(1)) % bvh.num_rows, bt, snode, sp

    def v_slab(row, bt, snode, sp):
        rec = gather(row)
        nk, nc, nb, hm = slab_argmin(rec, bt)
        return (row + nc + nb + hm) % bvh.num_rows, jnp.minimum(bt, nk), snode, sp

    def v_leaf(row, bt, snode, sp):
        rec = gather(row)
        bt2 = leaf(rec, bt)
        return (row + bt2.astype(jnp.int32)) % bvh.num_rows, bt2, snode, sp

    def v_slab_leaf(row, bt, snode, sp):
        rec = gather(row)
        nk, nc, nb, hm = slab_argmin(rec, bt)
        bt2 = leaf(rec, bt)
        return (row + nc) % bvh.num_rows, jnp.minimum(bt2, nk), snode, sp

    def v_stack(row, bt, snode, sp):
        rec = gather(row)
        c = _bitcast_i32(rec[:, 48:49]).sum(1)
        do_push = (row & 1) == 0
        at_sp = (levels == sp[None, :]) & do_push[None, :]
        sn = jnp.where(at_sp, row[None, :], snode)
        sp2 = sp + do_push.astype(jnp.int32)
        at_top = levels == (sp2 - 1)[None, :]
        top = jnp.sum(jnp.where(at_top, sn, 0), axis=0)
        sp3 = jnp.where(~do_push & (sp2 > 0), sp2 - 1, sp2)
        return (row + c + top) % bvh.num_rows, bt, sn, sp3 % stack_depth

    run("gather only", v_gather_only)
    run("gather + slab+argmin", v_slab)
    run("gather + leaf MT", v_leaf)
    run("gather + slab + leaf", v_slab_leaf)
    run("gather + stack ops", v_stack)


if __name__ == "__main__" and not os.environ.get("SPLIT"):
    main()


def split_test():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 518400
    iters = 16
    import jax
    import jax.numpy as jnp
    from dxrpathtracer_tpu.app.session import RenderSession
    from dxrpathtracer_tpu.app.settings import AppSettings, Scenes
    sess = RenderSession(settings=AppSettings(current_scene=Scenes.Sponza),
                         width=8, height=8)
    bvh = sess.bvh
    rng = np.random.default_rng(0)
    rows0 = jnp.asarray(rng.integers(0, bvh.num_rows, n).astype(np.int32))

    def run(name, body):
        @jax.jit
        def loop(r):
            def b(s):
                return (body(s[0]), s[1] + 1)
            return jax.lax.while_loop(lambda s: s[1] < iters, b, (r, 0))[0]
        r = loop(rows0); float(jax.device_get(r.ravel()[0]))
        ts = []
        for _ in range(3):
            t0 = time.time(); r = loop(rows0)
            float(jax.device_get(r.ravel()[0])); ts.append(time.time() - t0)
        print(f"{name:28s} {min(ts)/iters*1e3:8.3f} ms/iter", flush=True)

    def one(row):
        rec = jnp.take(bvh.table, row, axis=0, mode="clip")
        nxt = row + jnp.sum(rec[:, :1], 1).astype(jnp.int32)
        return nxt % bvh.num_rows

    def split4(row):
        m = n // 4
        recs = [jnp.take(bvh.table, row[k*m:(k+1)*m], axis=0, mode="clip")
                for k in range(4)]
        rec = jnp.concatenate(recs, axis=0)
        nxt = row + jnp.sum(rec[:, :1], 1).astype(jnp.int32)
        return nxt % bvh.num_rows

    def split4_nocat(row):
        m = n // 4
        outs = []
        for k in range(4):
            rec = jnp.take(bvh.table, row[k*m:(k+1)*m], axis=0, mode="clip")
            outs.append(row[k*m:(k+1)*m] + jnp.sum(rec[:, :1], 1).astype(jnp.int32))
        return jnp.concatenate(outs) % bvh.num_rows

    def split8(row):
        m = n // 8
        recs = [jnp.take(bvh.table, row[k*m:(k+1)*m], axis=0, mode="clip")
                for k in range(8)]
        rec = jnp.concatenate(recs, axis=0)
        nxt = row + jnp.sum(rec[:, :1], 1).astype(jnp.int32)
        return nxt % bvh.num_rows

    run("single gather", one)
    run("split4 + concat", split4)
    run("split4 no-concat", split4_nocat)
    run("split8 + concat", split8)


if os.environ.get("SPLIT"):
    split_test()
    sys.exit(0)
