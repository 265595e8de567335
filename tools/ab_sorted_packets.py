#!/usr/bin/env python3
"""A/B: direction-sorted packet traversal vs per-ray traversal on BOUNCE and
TERMINAL ray populations.

Round-2 finding: packets lose on depth>=2 rays ("origin scatter blows up the
node union", PERF_NOTES.md) — but bounce-ray ORIGINS are d1 hit points, the
same origins on which the d1 sun packet wins 4x; what scatters is the
DIRECTION (cosine hemisphere). A stable sort by direction octant groups
same-octant rays while preserving pixel-order origin adjacency, which should
restore the node-sequence sharing packets need. This measures:

  per-ray closest      vs  packet closest (pixel order)  vs  sorted-packet
  per-ray any (term.)  vs  packet any (pixel order)      vs  sorted-packet

on real d1-hit origins + cosine-hemisphere bounce directions, with equality
checks against the per-ray reference.

Usage: python tools/ab_sorted_packets.py [WIDTH HEIGHT]
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
    from dxrpathtracer_tpu.accel.packet import packet_any_hit, packet_closest_hit
    from dxrpathtracer_tpu.core.constants import FP32Max

    settings = AppSettings(current_scene=Scenes.Sponza, sqrt_num_samples=100,
                           max_path_length=3)
    sess = RenderSession(settings=settings, width=width, height=height)
    bvh = sess.bvh
    frame = sess.frame_constants(0)
    n = width * height
    print(f"tris={sess.scene_host.num_triangles} bvh_rows={bvh.num_rows} "
          f"{width}x{height} n={n}", flush=True)

    # primary rays -> d1 hit points
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

    rec1 = trav.closest_hit(bvh, jnp.asarray(o), jnp.asarray(d),
                            jnp.zeros((n,), jnp.float32),
                            jnp.asarray(ray_len.astype(np.float32)))
    tri1 = np.asarray(rec1.tri_id)
    hit1 = tri1 >= 0
    p1 = o + d * np.asarray(rec1.t)[..., None]

    # cosine-hemisphere bounce dirs around the geometric normal (the real
    # d2 direction distribution)
    pos = np.asarray(sess.scene_host.positions)
    tri = np.asarray(sess.scene_host.tri_idx)
    tclip = np.maximum(tri1, 0)
    v0 = pos[tri[tclip, 0]]
    e1 = pos[tri[tclip, 1]] - v0
    e2 = pos[tri[tclip, 2]] - v0
    gn = np.cross(e1, e2)
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
    bd = (rr * np.cos(phi))[:, None] * t_axis \
        + (rr * np.sin(phi))[:, None] * b_axis \
        + np.sqrt(np.maximum(1 - r1, 0))[:, None] * gn
    bd = (bd / np.maximum(np.linalg.norm(bd, axis=-1, keepdims=True),
                          1e-20)).astype(np.float32)

    o_d = jnp.asarray(p1)
    d_d = jnp.asarray(bd)
    act = jnp.asarray(hit1)
    tmin = jnp.full((n,), 1e-5, jnp.float32)
    tmax = jnp.full((n,), FP32Max, jnp.float32)
    print(f"d1 active={hit1.mean():.3f}", flush=True)

    def sort_key(dvec, active, bits):
        """Direction bucket: sign octant (3 bits) + optional dominant-axis
        refinement. Inactive lanes sort to the end. Stable sort preserves
        pixel-order origin adjacency inside each bucket."""
        sx = (dvec[:, 0] < 0).astype(jnp.int32)
        sy = (dvec[:, 1] < 0).astype(jnp.int32)
        sz = (dvec[:, 2] < 0).astype(jnp.int32)
        key = sx * 4 + sy * 2 + sz
        if bits > 3:
            ax = jnp.argmax(jnp.abs(dvec), axis=1).astype(jnp.int32)
            key = key * 4 + ax
        return jnp.where(active, key, 1 << 20)

    def run_sorted(fn, bits):
        def wrapped(o_, d_, a_):
            key = sort_key(d_, a_, bits)
            perm = jnp.argsort(key, stable=True)
            inv = jnp.zeros((n,), jnp.int32).at[perm].set(
                jnp.arange(n, dtype=jnp.int32))
            out = fn(jnp.take(o_, perm, axis=0), jnp.take(d_, perm, axis=0),
                     jnp.take(a_, perm, axis=0))
            return jax.tree.map(lambda x: jnp.take(x, inv, axis=0), out)
        return wrapped

    def timed(fn, *args, reps=3):
        out = fn(*args)
        jax.tree.flatten(out)
        float(np.asarray(jax.tree.leaves(out)[0].ravel()[0]))
        ts = []
        for _ in range(reps):
            t0 = time.time()
            out = fn(*args)
            float(np.asarray(jax.tree.leaves(out)[0].ravel()[0]))
            ts.append(time.time() - t0)
        return min(ts), out

    # ---- closest-hit (bounce) ----
    per_ray = jax.jit(lambda o_, d_, a_: trav.closest_hit(bvh, o_, d_, tmin, tmax, a_))
    pk = jax.jit(lambda o_, d_, a_: packet_closest_hit(bvh, o_, d_, tmin, tmax, a_))
    pk_s3 = jax.jit(run_sorted(lambda o_, d_, a_: packet_closest_hit(bvh, o_, d_, tmin, tmax, a_), 3))
    pk_s5 = jax.jit(run_sorted(lambda o_, d_, a_: packet_closest_hit(bvh, o_, d_, tmin, tmax, a_), 5))
    ref = None
    for name, fn in (("per-ray closest", per_ray), ("packet closest", pk),
                     ("sorted(8) packet closest", pk_s3),
                     ("sorted(32) packet closest", pk_s5)):
        dt, out = timed(fn, o_d, d_d, act)
        tri_out = np.asarray(out.tri_id)
        if ref is None:
            ref = tri_out
            mism = 0
        else:
            mism = int((tri_out != ref).sum())
        print(f"bounce closest  {name:28s} {dt*1e3:8.1f} ms  mism={mism}",
              flush=True)

    # ---- any-hit (terminal) ----
    per_ray_a = jax.jit(lambda o_, d_, a_: trav.any_hit(bvh, o_, d_, tmin, tmax, a_))
    pk_a = jax.jit(lambda o_, d_, a_: packet_any_hit(bvh, o_, d_, tmin, tmax, a_))
    pk_a_s3 = jax.jit(run_sorted(lambda o_, d_, a_: packet_any_hit(bvh, o_, d_, tmin, tmax, a_), 3))
    ref = None
    for name, fn in (("per-ray any", per_ray_a), ("packet any", pk_a),
                     ("sorted(8) packet any", pk_a_s3)):
        dt, out = timed(fn, o_d, d_d, act)
        vis = np.asarray(out)
        if ref is None:
            ref = vis
            mism = 0
        else:
            mism = int((vis != ref).sum())
        print(f"terminal any    {name:28s} {dt*1e3:8.1f} ms  mism={mism}",
              flush=True)


if __name__ == "__main__":
    main()
