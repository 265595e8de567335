#!/usr/bin/env python3
"""Device A/B: dense-proxy pre-pass (accel/proxy.py) on the per-ray
depth>=2 blocks — bounce closest (proxy-seeded t_max) and terminal any
(proxy-screened active set) — at production slab populations.

Also reports the proxy stage's own cost, the blocked/seed-hit fractions
(the win's mechanism), and result agreement vs the plain engines
(divergence allowed only on equal-t ties).

Usage: python tools/ab_proxy.py [WIDTH HEIGHT] [--k 128]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tools._timing import timed


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("dims", nargs="*", type=int, default=[1920, 1080])
    ap.add_argument("--k", type=int, default=128)
    ap.add_argument("--scene", default="Sponza")
    args = ap.parse_args()
    width, height = (args.dims + [1920, 1080])[:2]

    from dxrpathtracer_tpu.accel import traverse as trav
    from dxrpathtracer_tpu.accel.proxy import (build_dense_proxy,
                                               proxy_blocked, proxy_closest,
                                               screened_any, seeded_closest)
    from dxrpathtracer_tpu.accel.packet import packet_closest_hit
    from dxrpathtracer_tpu.app.session import RenderSession
    from dxrpathtracer_tpu.app.settings import AppSettings, Scenes
    from dxrpathtracer_tpu.core.constants import FP32Max
    from dxrpathtracer_tpu.render.integrator import (_packet_tile_dims,
                                                     _tile_order, raygen)
    from dxrpathtracer_tpu.render.swraster import raster_closest_hit

    sess = RenderSession(settings=AppSettings(
        current_scene=Scenes[args.scene]), width=width, height=height)
    slab_h = sess._slab_h
    frame = sess.frame_constants(0)
    o, d, length, _pix = raygen(sess.settings, frame, width, slab_h,
                                row_offset=0, total_height=height)
    ty, tx = _packet_tile_dims(slab_h, width)
    o_t = _tile_order(o, slab_h, width, ty, tx)
    d_t = _tile_order(d, slab_h, width, ty, tx)
    l_t = _tile_order(length, slab_h, width, ty, tx)
    n = o_t.shape[0]

    pos_np = np.asarray(sess.scene_host.positions)
    tri_np = np.asarray(sess.scene_host.tri_idx)
    tri_alpha = None
    if sess.scene_host.materials.any_opacity:
        tri_mat = np.asarray(sess.scene_host.tri_material)
        has_op = np.asarray(sess.scene_host.materials.has_opacity, bool)
        tri_alpha = has_op[tri_mat]
    proxy = build_dense_proxy(pos_np, tri_np, tri_alpha=tri_alpha, k=args.k)
    print(f"slab {slab_h} rows, {n} lanes; proxy K={proxy.k}", flush=True)

    bins = sess._raster_slabs[0] if sess._raster_slabs else None
    if bins is not None:
        rec = raster_closest_hit(bins, o_t, d_t, 0.0, l_t, None)
    else:
        rec = packet_closest_hit(sess.bvh, o_t, d_t, jnp.zeros_like(l_t),
                                 l_t)
    hit = np.asarray(rec.hit)
    t_np = np.asarray(rec.t)
    print(f"primary hit frac {hit.mean():.3f}", flush=True)
    pos = np.asarray(o_t) + np.asarray(d_t) * (t_np * 0.999)[:, None]

    rng = np.random.default_rng(0)
    z = rng.uniform(0, 1, n)
    phi = rng.uniform(0, 2 * np.pi, n)
    r = np.sqrt(z)
    up = rng.normal(size=(n, 3))
    up /= np.linalg.norm(up, axis=1, keepdims=True)
    bd = np.stack([r * np.cos(phi), r * np.sin(phi),
                   np.sqrt(np.maximum(1 - z, 0))], -1)
    bd = bd + 0.3 * up
    bd /= np.linalg.norm(bd, axis=1, keepdims=True)

    o_b = jnp.asarray(pos.astype(np.float32))
    d_b = jnp.asarray(bd.astype(np.float32))
    act = jnp.asarray(hit)
    tmin = jnp.full((n,), 1e-5, jnp.float32)
    tmax = jnp.full((n,), FP32Max, jnp.float32)

    # mechanism stats
    blocked = np.asarray(proxy_blocked(proxy, o_b, d_b, tmin, tmax, act))
    pt, ptri, _pu, _pv = proxy_closest(proxy, o_b, d_b, tmin, tmax, act)
    seeded = np.asarray(ptri) >= 0
    print(f"terminal: proxy-blocked {blocked.sum()}/{act.sum()} "
          f"({blocked.sum() / max(int(np.asarray(act).sum()), 1):.1%} of active)")
    print(f"bounce:   proxy-seeded  {seeded[np.asarray(act)].mean():.1%} of "
          f"active lanes carry a finite t bound", flush=True)

    probes = {
        "proxy stage alone": jax.jit(lambda: proxy_closest(
            proxy, o_b, d_b, tmin, tmax, act)),
        "terminal any plain": jax.jit(lambda: trav.any_hit(
            sess.bvh_ray, o_b, d_b, tmin, tmax, act)),
        "terminal any screened": jax.jit(lambda: screened_any(
            lambda *a: trav.any_hit(sess.bvh_ray, *a), proxy,
            o_b, d_b, tmin, tmax, act)),
        "bounce closest plain": jax.jit(lambda: trav.closest_hit(
            sess.bvh_ray, o_b, d_b, tmin, tmax, act)),
        "bounce closest seeded": jax.jit(lambda: seeded_closest(
            lambda o_, d_, tn_, tx_, a_: trav.closest_hit(
                sess.bvh_ray, o_, d_, tn_, tx_, a_), proxy,
            o_b, d_b, tmin, tmax, act)),
    }
    res = {}
    for name, fn in probes.items():
        ms = timed(fn) * 1e3
        res[name] = fn()
        print(f"{name:24s} {ms:8.2f} ms/slab "
              f"(~{ms * (height // slab_h):6.1f} ms/frame)", flush=True)

    # agreement (tie divergence only): visibility must match exactly;
    # closest t must match to fp noise, tri may differ only at equal t
    va = np.asarray(res["terminal any plain"])
    vb = np.asarray(res["terminal any screened"])
    mis = int((va != vb).sum())
    print(f"terminal agreement: {mis} visibility mismatches / {n}")
    ra = res["bounce closest plain"]
    rb = res["bounce closest seeded"]
    ta, tb = np.asarray(ra.t), np.asarray(rb.t)
    dt_rel = np.abs(ta - tb) / np.maximum(np.abs(ta), 1e-6)
    tri_mis = int(((np.asarray(ra.tri_id) != np.asarray(rb.tri_id))
                   & (dt_rel > 1e-5)).sum())
    print(f"bounce agreement: max rel t diff {dt_rel.max():.2e}, "
          f"{tri_mis} non-tie tri mismatches / {n}")


if __name__ == "__main__":
    main()
