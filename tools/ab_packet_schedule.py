#!/usr/bin/env python3
"""A/B: compaction-schedule depth on the PACKET engines (primary closest +
depth-1 sun any-hit populations). Companion to ab_compact_schedule.py, which
covers the per-ray W32 engines (those flipped to a deeper 8x2048 default on
2026-08-19); packets kept the shallow schedule pending this measurement.

The packet floor is in PACKET units: DXRPT_MIN_COMPACT_SIZE=2048 means a
floor of max(2048//128, 32) = 32 packets.

Usage: python tools/ab_packet_schedule.py [WIDTH HEIGHT]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANTS = [
    # (name, DXRPT_MAX_COMPACT_PHASES, DXRPT_MIN_COMPACT_SIZE)
    ("default 4ph", None, None),
    ("6 phases", "6", "8192"),
    ("8 phases", "8", "2048"),
]


def main():
    width = int(sys.argv[1]) if len(sys.argv) > 1 else 960
    height = int(sys.argv[2]) if len(sys.argv) > 2 else 540

    import jax
    import jax.numpy as jnp
    from dxrpathtracer_tpu.app.session import RenderSession
    from dxrpathtracer_tpu.app.settings import AppSettings, Scenes
    from dxrpathtracer_tpu.accel.packet import (packet_closest_hit,
                                                packet_any_hit)
    from dxrpathtracer_tpu.core.constants import FP32Max
    from dxrpathtracer_tpu.render.integrator import (_tile_order,
                                                     _packet_tile_dims)

    settings = AppSettings(current_scene=Scenes.Sponza, sqrt_num_samples=100,
                           max_path_length=3)
    sess = RenderSession(settings=settings, width=width, height=height)
    frame = sess.frame_constants(0)
    n = width * height

    yy, xx = np.meshgrid(np.arange(height, dtype=np.float32),
                         np.arange(width, dtype=np.float32), indexing="ij")
    ncd_x = (xx.reshape(-1) + 0.5) / (width * 0.5) - 1.0
    ncd_y = -((yy.reshape(-1) + 0.5) / (height * 0.5) - 1.0)
    ivp = np.asarray(frame.inv_view_projection)

    def unproject(z):
        out = (ncd_x[..., None] * ivp[0] + ncd_y[..., None] * ivp[1]
               + z * ivp[2] + ivp[3])
        return out[..., :3] / out[..., 3:4]

    o = unproject(0.0).astype(np.float32)
    e = unproject(1.0).astype(np.float32)
    seg = e - o
    ray_len = np.linalg.norm(seg, axis=-1)
    d = (seg / ray_len[..., None]).astype(np.float32)

    ty, tx = _packet_tile_dims(height, width)

    def tile(a):
        return np.asarray(_tile_order(jnp.asarray(a), height, width, ty, tx))

    o_t, d_t, len_t = tile(o), tile(d), tile(ray_len)
    o_dev, d_dev = jnp.asarray(o_t), jnp.asarray(d_t)
    tmin0 = jnp.zeros((n,), jnp.float32)
    tmax0 = jnp.asarray(len_t)

    # depth-1 sun any-hit population: hit points + sun direction
    rec1 = packet_closest_hit(sess.bvh, o_dev, d_dev, tmin0, tmax0)
    tri1 = np.asarray(rec1.tri_id)
    hit1 = tri1 >= 0
    p1 = o_t + d_t * np.asarray(rec1.t)[..., None]
    sun_dir = np.asarray(frame.sun_direction_ws, dtype=np.float32)
    sun_dir /= np.linalg.norm(sun_dir)
    o_s = jnp.asarray(p1.astype(np.float32))
    d_s = jnp.broadcast_to(jnp.asarray(sun_dir), (n, 3))
    act_s = jnp.asarray(hit1)
    tmin_s = jnp.full((n,), 1e-5, jnp.float32)
    tmax_s = jnp.full((n,), FP32Max, jnp.float32)

    def timed(fn, reps=4):
        out = fn()
        float(np.asarray(jax.tree.leaves(out)[0].ravel()[0]))
        ts = []
        for _ in range(reps):
            t0 = time.time()
            out = fn()
            float(np.asarray(jax.tree.leaves(out)[0].ravel()[0]))
            ts.append(time.time() - t0)
        return min(ts), out

    def set_knobs(phases, floor):
        for key, val in (("DXRPT_MAX_COMPACT_PHASES", phases),
                         ("DXRPT_MIN_COMPACT_SIZE", floor)):
            if val is None:
                os.environ.pop(key, None)
            else:
                os.environ[key] = val

    fns = {}
    for name, phases, floor in VARIANTS:
        set_knobs(phases, floor)
        fns[name] = (
            jax.jit(lambda: packet_closest_hit(
                sess.bvh, o_dev, d_dev, tmin0, tmax0)).lower().compile(),
            jax.jit(lambda: packet_any_hit(
                sess.bvh, o_s, d_s, tmin_s, tmax_s,
                act_s)).lower().compile(),
        )
        print(f"# compiled {name}", file=sys.stderr, flush=True)
    set_knobs(None, None)

    results = {name: [float("inf"), float("inf")] for name, *_ in VARIANTS}
    outs = {}
    for _ in range(2):
        for name, *_ in VARIANTS:
            tc, oc = timed(lambda f=fns[name][0]: f())
            ta, oa = timed(lambda f=fns[name][1]: f())
            results[name][0] = min(results[name][0], tc)
            results[name][1] = min(results[name][1], ta)
            outs[name] = (oc, oa)

    base_c, base_a = outs[VARIANTS[0][0]]
    m = hit1
    print(f"packet-schedule A/B {width}x{height} ({int(hit1.sum())} d1-sun "
          f"active):")
    print(f"  {'variant':16s} {'closest ms':>11s} {'sun-any ms':>11s}  "
          f"mismatches")
    for name, *_ in VARIANTS:
        tc, ta = results[name]
        oc, oa = outs[name]
        mc = int((np.asarray(oc.tri_id) != np.asarray(base_c.tri_id)).sum())
        ma = int((np.asarray(oa)[m] != np.asarray(base_a)[m]).sum())
        print(f"  {name:16s} {tc*1e3:11.1f} {ta*1e3:11.1f}  c={mc} a={ma}")


if __name__ == "__main__":
    main()
