#!/usr/bin/env python3
"""Honest per-ray traversal block timing at production 1080p populations.

Round-3's frame decomposition synced per invocation and carried the
~35-73 ms tunnel RTT floor in every number (tools/_timing.py); this probe
re-measures the per-ray W32 blocks (bounce closest, terminal any, sunspace
d2) with the enqueued protocol so round-4 optimization targets the real
costs.

Usage: python tools/probe_perray.py [WIDTH HEIGHT]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tools._timing import timed


def main():
    width = int(sys.argv[1]) if len(sys.argv) > 1 else 1920
    height = int(sys.argv[2]) if len(sys.argv) > 2 else 1080

    from dxrpathtracer_tpu.accel import traverse as trav
    from dxrpathtracer_tpu.accel.packet import (packet_any_hit,
                                                packet_closest_hit)
    from dxrpathtracer_tpu.accel.sunspace import sun_any_hit
    from dxrpathtracer_tpu.app.session import RenderSession
    from dxrpathtracer_tpu.app.settings import AppSettings, Scenes
    from dxrpathtracer_tpu.core.constants import FP32Max
    from dxrpathtracer_tpu.render.integrator import (_packet_tile_dims,
                                                     _tile_order, raygen)
    from dxrpathtracer_tpu.render.swraster import raster_closest_hit

    sess = RenderSession(settings=AppSettings(current_scene=Scenes.Sponza),
                         width=width, height=height)
    slab_h = sess._slab_h
    frame = sess.frame_constants(0)
    o, d, length, _pix = raygen(sess.settings, frame, width, slab_h,
                                row_offset=0, total_height=height)
    ty, tx = _packet_tile_dims(slab_h, width)
    o_t = _tile_order(o, slab_h, width, ty, tx)
    d_t = _tile_order(d, slab_h, width, ty, tx)
    l_t = _tile_order(length, slab_h, width, ty, tx)
    n = o_t.shape[0]
    print(f"slab {slab_h} rows, {n} lanes, tiles {ty}x{tx}", flush=True)

    # primary hits (raster) -> production-like bounce population
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
    bd = (np.stack([r * np.cos(phi), r * np.sin(phi),
                    np.sqrt(np.maximum(1 - z, 0))], -1) @ np.eye(3))
    bd = bd + 0.3 * up
    bd /= np.linalg.norm(bd, axis=1, keepdims=True)

    o_b = jnp.asarray(pos.astype(np.float32))
    d_b = jnp.asarray(bd.astype(np.float32))
    act = jnp.asarray(hit)
    tmin = jnp.full((n,), 1e-5, jnp.float32)
    tmax = jnp.full((n,), FP32Max, jnp.float32)

    sun = np.asarray(sess.settings.sun_direction, np.float32)
    sun = sun / np.linalg.norm(sun)
    d_sun = jnp.broadcast_to(jnp.asarray(sun), (n, 3))

    probes = {
        "raster primary": jax.jit(lambda: raster_closest_hit(
            bins, o_t, d_t, 0.0, l_t, None)) if bins is not None else None,
        "packet primary": jax.jit(lambda: packet_closest_hit(
            sess.bvh, o_t, d_t, jnp.zeros_like(l_t), l_t)),
        "packet sun d1": jax.jit(lambda: packet_any_hit(
            sess.bvh, o_b, d_sun, tmin, tmax, act)),
        "per-ray bounce closest W32": jax.jit(lambda: trav.closest_hit(
            sess.bvh_ray, o_b, d_b, tmin, tmax, act)),
        "per-ray terminal any W32": jax.jit(lambda: trav.any_hit(
            sess.bvh_ray, o_b, d_b, tmin, tmax, act)),
    }
    if sess.sun_grid is not None:
        probes["sunspace sun d2"] = jax.jit(lambda: sun_any_hit(
            sess.sun_grid, o_b, d_sun, tmin, tmax, act))

    for name, fn in probes.items():
        if fn is None:
            continue
        ms = timed(fn) * 1e3
        print(f"{name:28s} {ms:8.2f} ms/slab  (~{ms * (height // slab_h):6.1f}"
              f" ms/frame)", flush=True)


if __name__ == "__main__":
    main()
