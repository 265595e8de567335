#!/usr/bin/env python3
"""A/B: ray-compaction schedule depth (DXRPT_MAX_COMPACT_PHASES /
DXRPT_MIN_COMPACT_SIZE) on the production per-ray W32 populations.

Motivation: at 518k lanes the default schedule (4 halvings, floor 8192)
leaves a ~32k-lane tail that runs to the worst lane's iteration count. The
SimTree row need for a bounce ray is ~5.6 rows/ray but production measures
~14.5 paid rows/ray — most of the gap is rows gathered by finished-but-not-
yet-compacted lanes inside phases and by the undrained tail. Deeper
schedules shrink the tail at the cost of one more while_loop instance
(compile) + one more boundary permute per phase.

Times per-ray closest (bounce population) and per-ray any (terminal
population), interleaved best-of across schedule variants, equality-checked
against the default schedule.

Usage: python tools/ab_compact_schedule.py [WIDTH HEIGHT]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANTS = [
    # (name, DXRPT_MAX_COMPACT_PHASES, DXRPT_MIN_COMPACT_SIZE,
    #  DXRPT_SPREAD_DEAD_ROWS)
    # 2026-08-19 v5e result (518k lanes, W32): old default 121.3/104.4 ms
    # (closest/any), 6 phases 116.9/100.7, 8ph/2048 114.6/98.1,
    # spread-dead neutral -> per-ray default flipped to 8ph/2048.
    ("default (8x2048)", None, None, None),
    ("old 4x8192", "4", "8192", None),
    ("6 phases", "6", "8192", None),
    ("default + spread-dead", None, None, "1"),
]


def main():
    width = int(sys.argv[1]) if len(sys.argv) > 1 else 960
    height = int(sys.argv[2]) if len(sys.argv) > 2 else 540

    import jax
    import jax.numpy as jnp
    from dxrpathtracer_tpu.app.session import RenderSession
    from dxrpathtracer_tpu.app.settings import AppSettings, Scenes
    from dxrpathtracer_tpu.accel import traverse as trav
    from dxrpathtracer_tpu.accel.packet import packet_closest_hit
    from dxrpathtracer_tpu.core.constants import FP32Max
    from dxrpathtracer_tpu.render.integrator import _tile_order, _packet_tile_dims

    settings = AppSettings(current_scene=Scenes.Sponza, sqrt_num_samples=100,
                           max_path_length=3)
    sess = RenderSession(settings=settings, width=width, height=height)
    frame = sess.frame_constants(0)
    n = width * height

    pos = np.asarray(sess.scene_host.positions)
    tri = np.asarray(sess.scene_host.tri_idx)

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
    rec1 = packet_closest_hit(sess.bvh, jnp.asarray(o_t), jnp.asarray(d_t),
                              jnp.zeros((n,), jnp.float32),
                              jnp.asarray(len_t))
    tri1 = np.asarray(rec1.tri_id)
    hit1 = tri1 >= 0
    p1 = o_t + d_t * np.asarray(rec1.t)[..., None]

    tclip = np.maximum(tri1, 0)
    w0 = pos[tri[tclip, 0]]
    gn = np.cross(pos[tri[tclip, 1]] - w0, pos[tri[tclip, 2]] - w0)
    gn /= np.maximum(np.linalg.norm(gn, axis=-1, keepdims=True), 1e-20)
    gn = np.where((np.einsum('ij,ij->i', gn, d_t) > 0)[:, None], -gn, gn)
    rng = np.random.default_rng(0)
    r1 = rng.random(n).astype(np.float32)
    r2 = rng.random(n).astype(np.float32)
    rr = np.sqrt(r1)
    phi = 2 * np.pi * r2
    t_axis = np.where(np.abs(gn[:, 2:3]) < 0.9,
                      np.cross(gn, np.array([0, 0, 1.0])),
                      np.cross(gn, np.array([0, 1.0, 0])))
    t_axis /= np.maximum(np.linalg.norm(t_axis, axis=-1, keepdims=True), 1e-20)
    b_axis = np.cross(gn, t_axis)
    bd = ((rr * np.cos(phi))[:, None] * t_axis
          + (rr * np.sin(phi))[:, None] * b_axis
          + np.sqrt(np.maximum(1 - r1, 0))[:, None] * gn)
    bd = (bd / np.maximum(np.linalg.norm(bd, axis=-1, keepdims=True),
                          1e-20)).astype(np.float32)

    o_b = jnp.asarray(p1.astype(np.float32))
    d_b = jnp.asarray(bd)
    act = jnp.asarray(hit1)
    tmin = jnp.full((n,), 1e-5, jnp.float32)
    tmax = jnp.full((n,), FP32Max, jnp.float32)

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

    def set_knobs(phases, floor, spread):
        for key, val in (("DXRPT_MAX_COMPACT_PHASES", phases),
                         ("DXRPT_MIN_COMPACT_SIZE", floor),
                         ("DXRPT_SPREAD_DEAD_ROWS", spread)):
            if val is None:
                os.environ.pop(key, None)
            else:
                os.environ[key] = val

    # Build jitted fns per variant (knobs read at trace time).
    fns = {}
    for name, phases, floor, spread in VARIANTS:
        set_knobs(phases, floor, spread)
        fns[name] = (
            jax.jit(lambda: trav.closest_hit(
                sess.bvh_ray, o_b, d_b, tmin, tmax, act)).lower().compile(),
            jax.jit(lambda: trav.any_hit_rec(
                sess.bvh_ray, o_b, d_b, tmin, tmax, act)).lower().compile(),
        )
        print(f"# compiled {name}", file=sys.stderr, flush=True)
    set_knobs(None, None, None)

    results = {name: [float("inf"), float("inf")] for name, *_ in VARIANTS}
    outs = {}
    for _ in range(2):  # interleaved rounds (drift-proof)
        for name, *_ in VARIANTS:
            tc, oc = timed(lambda f=fns[name][0]: f())
            ta, oa = timed(lambda f=fns[name][1]: f())
            results[name][0] = min(results[name][0], tc)
            results[name][1] = min(results[name][1], ta)
            outs[name] = (oc, oa)

    base_c, base_a = outs[VARIANTS[0][0]]
    m = hit1
    print(f"compact-schedule A/B {width}x{height} ({int(hit1.sum())} active, "
          f"W32 table):")
    print(f"  {'variant':24s} {'closest ms':>11s} {'any ms':>9s}  mismatches")
    for name, *_ in VARIANTS:
        tc, ta = results[name]
        oc, oa = outs[name]
        mc = int((np.asarray(oc.tri_id)[m] != np.asarray(base_c.tri_id)[m]).sum())
        # any_hit_rec returns (visibility, occluder tri_id)
        ma = int((np.asarray(oa[0])[m] != np.asarray(base_a[0])[m]).sum())
        print(f"  {name:24s} {tc*1e3:11.1f} {ta*1e3:9.1f}  c={mc} a={ma}")


if __name__ == "__main__":
    main()
