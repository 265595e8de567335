#!/usr/bin/env python3
"""A/B: wide bf16-internal BVH records (W=16/32) vs the classic W=8 f32
layout, on the real bench scene and realistic ray populations.

Motivation chain (PERF_NOTES.md):
  - traversal cost = gathered rows x ~flat per-row cost (row width free to
    512 B — tools/microbench_gather_width.py);
  - internal visits dominate rows/ray (tools/sim_record_width.py: bounce
    7.1 int + 1.3 leaf at W8); wider fanout cuts them (W32: 4.2 + 1.2);
  - bf16 child AABBs (conservative directed rounding) fit W=32 in the same
    512 B record, so the wider fanout costs nothing per row.

Times per-ray closest (bounce population), per-ray any (terminal), packet
closest (camera primaries), packet any (d1 sun) for each width, with
equality counters vs W8 (results must match exactly: leaves are f32 and
bf16 boxes only admit spurious descents).

Usage: python tools/ab_wide_records.py [WIDTH HEIGHT]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    width = int(sys.argv[1]) if len(sys.argv) > 1 else 960
    height = int(sys.argv[2]) if len(sys.argv) > 2 else 540

    import jax
    import jax.numpy as jnp
    from dxrpathtracer_tpu.app.session import RenderSession
    from dxrpathtracer_tpu.app.settings import AppSettings, Scenes
    from dxrpathtracer_tpu.accel import traverse as trav
    from dxrpathtracer_tpu.accel.lbvh import build_bvh
    from dxrpathtracer_tpu.accel.packet import packet_any_hit, packet_closest_hit
    from dxrpathtracer_tpu.core.constants import FP32Max

    settings = AppSettings(current_scene=Scenes.Sponza, sqrt_num_samples=100,
                           max_path_length=3)
    sess = RenderSession(settings=settings, width=width, height=height)
    frame = sess.frame_constants(0)
    n = width * height

    pos = np.asarray(sess.scene_host.positions)
    tri = np.asarray(sess.scene_host.tri_idx)
    v0, v1, v2 = pos[tri[:, 0]], pos[tri[:, 1]], pos[tri[:, 2]]

    bvhs = {8: sess.bvh}
    for w in (16, 32):
        t0 = time.time()
        bvhs[w] = build_bvh(v0, v1, v2, width=w)
        print(f"W{w}: rows={bvhs[w].num_rows} depth={bvhs[w].max_depth} "
              f"build {time.time()-t0:.0f}s", flush=True)

    # ray populations (same recipe as tools/ab_sorted_packets.py)
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

    rec1 = trav.closest_hit(bvhs[8], jnp.asarray(o), jnp.asarray(d),
                            jnp.zeros((n,), jnp.float32),
                            jnp.asarray(ray_len.astype(np.float32)))
    tri1 = np.asarray(rec1.tri_id)
    hit1 = tri1 >= 0
    p1 = o + d * np.asarray(rec1.t)[..., None]

    tclip = np.maximum(tri1, 0)
    w0 = pos[tri[tclip, 0]]
    gn = np.cross(pos[tri[tclip, 1]] - w0, pos[tri[tclip, 2]] - w0)
    gn /= np.maximum(np.linalg.norm(gn, axis=-1, keepdims=True), 1e-20)
    gn = np.where((np.einsum('ij,ij->i', gn, d) > 0)[:, None], -gn, gn)
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

    o_prim = jnp.asarray(o)
    d_prim = jnp.asarray(d)
    o_b = jnp.asarray(p1)
    d_b = jnp.asarray(bd)
    act = jnp.asarray(hit1)
    sun = np.asarray(frame.sun_direction_ws, np.float32)
    sun_b = jnp.broadcast_to(jnp.asarray(sun), (n, 3))
    tmin0 = jnp.zeros((n,), jnp.float32)
    tmin = jnp.full((n,), 1e-5, jnp.float32)
    tmax = jnp.full((n,), FP32Max, jnp.float32)
    tlen = jnp.asarray(ray_len.astype(np.float32))

    def timed(fn, *args, reps=3):
        out = fn(*args)
        float(np.asarray(jax.tree.leaves(out)[0].ravel()[0]))
        ts = []
        for _ in range(reps):
            t0 = time.time()
            out = fn(*args)
            float(np.asarray(jax.tree.leaves(out)[0].ravel()[0]))
            ts.append(time.time() - t0)
        return min(ts), out

    cases = [
        ("bounce closest (per-ray)",
         lambda b: jax.jit(lambda: trav.closest_hit(b, o_b, d_b, tmin, tmax, act)),
         lambda out: np.asarray(out.tri_id)),
        ("terminal any (per-ray)",
         lambda b: jax.jit(lambda: trav.any_hit(b, o_b, d_b, tmin, tmax, act)),
         lambda out: np.asarray(out)),
        ("primary closest (packet)",
         lambda b: jax.jit(lambda: packet_closest_hit(b, o_prim, d_prim, tmin0, tlen)),
         lambda out: np.asarray(out.tri_id)),
        ("d1 sun any (packet)",
         lambda b: jax.jit(lambda: packet_any_hit(b, o_b, sun_b, tmin, tmax, act)),
         lambda out: np.asarray(out)),
    ]
    for label, mk, extract in cases:
        ref = None
        for w in (8, 16, 32):
            dt, out = timed(mk(bvhs[w]))
            val = extract(out)
            mism = 0 if ref is None else int((val != ref).sum())
            if ref is None:
                ref = val
            print(f"{label:26s} W{w:<3d} {dt*1e3:8.1f} ms  mism={mism}",
                  flush=True)


if __name__ == "__main__":
    main()
