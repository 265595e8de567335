#!/usr/bin/env python3
"""In-process A/B: sun-space grid vs BVH any-hit on realistic sun-ray
populations (d1 = primary-hit origins, d2 = bounce-hit origins).

Usage: python tools/ab_sunspace.py [WIDTH HEIGHT]
In-process interleaved timing only (session-to-session drift is +-25%;
PERF_NOTES.md). Sync via tiny readback, never np.asarray(big).
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
    from dxrpathtracer_tpu.accel.packet import packet_any_hit
    from dxrpathtracer_tpu.accel.sunspace import build_sun_grid, sun_any_hit
    from dxrpathtracer_tpu.core.constants import FP32Max

    settings = AppSettings(current_scene=Scenes.Sponza, sqrt_num_samples=100,
                           max_path_length=3)
    sess = RenderSession(settings=settings, width=width, height=height)
    bvh = sess.bvh
    frame = sess.frame_constants(0)
    n = width * height
    print(f"tris={sess.scene_host.num_triangles} bvh_rows={bvh.num_rows} "
          f"{width}x{height} n={n}", flush=True)

    pos = np.asarray(sess.scene_host.positions)
    tri = np.asarray(sess.scene_host.tri_idx)
    v0, v1, v2 = pos[tri[:, 0]], pos[tri[:, 1]], pos[tri[:, 2]]
    sun = np.asarray(frame.sun_direction_ws, np.float32)

    grids = {}
    variants = (("grid_v2", dict()),)
    if os.environ.get("AB_ALL_GRIDS"):
        # NOTE: grid_size=4096 crashes the axon remote-compile (HTTP 413
        # request-size limit on the 16M-entry index) — 1024 is the largest
        # practical index on this platform.
        variants += (("grid_v2_s1024", dict(grid_size=1024)),
                     ("grid_v2_lc48", dict(leaf_cap=48, dup_max=16)))
    for name, kw in variants:
        t0 = time.time()
        grids[name] = build_sun_grid(v0, v1, v2, sun, **kw)
        print(f"{name}: rows={grids[name].num_rows} "
              f"({grids[name].num_rows*512/1e6:.0f} MB) "
              f"build={time.time()-t0:.1f}s", flush=True)

    # primary rays -> hit points (d1 origins); bounce -> d2 origins
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
    hit1 = np.asarray(rec1.tri_id) >= 0
    p1 = o + d * np.asarray(rec1.t)[..., None]
    rng = np.random.default_rng(0)
    bd = rng.normal(size=(n, 3)).astype(np.float32)
    bd /= np.linalg.norm(bd, axis=-1, keepdims=True)
    rec2 = trav.closest_hit(bvh, jnp.asarray(p1), jnp.asarray(bd),
                            jnp.full((n,), 1e-5, jnp.float32),
                            jnp.full((n,), FP32Max, jnp.float32),
                            jnp.asarray(hit1))
    hit2 = hit1 & (np.asarray(rec2.tri_id) >= 0)
    p2 = p1 + bd * np.asarray(rec2.t)[..., None]
    print(f"d1 active={hit1.mean():.3f} d2 active={hit2.mean():.3f}",
          flush=True)

    sun_b = jnp.broadcast_to(jnp.asarray(sun), (n, 3))
    tmin = jnp.full((n,), 1e-5, jnp.float32)
    tmax = jnp.full((n,), FP32Max, jnp.float32)
    cases = {"d1": (jnp.asarray(p1), jnp.asarray(hit1)),
             "d2": (jnp.asarray(p2), jnp.asarray(hit2))}

    def timed(fn, *args, reps=3):
        out = fn(*args)
        float(out.ravel()[0])
        ts = []
        for _ in range(reps):
            t0 = time.time()
            out = fn(*args)
            float(out.ravel()[0])
            ts.append(time.time() - t0)
        return min(ts), out

    jit_any = jax.jit(lambda o_, a_: trav.any_hit(bvh, o_, sun_b, tmin, tmax, a_))
    jit_pk = jax.jit(lambda o_, a_: packet_any_hit(bvh, o_, sun_b, tmin, tmax, a_))
    jits = {"per-ray any_hit": jit_any, "packet any_hit": jit_pk}
    for gname, g in grids.items():
        jits[f"sunspace {gname}"] = jax.jit(
            lambda o_, a_, _g=g: sun_any_hit(_g, o_, sun_b, tmin, tmax, a_))

    for cname, (o_, a_) in cases.items():
        ref = None
        for jname, jfn in jits.items():
            dt, out = timed(jfn, o_, a_)
            vis = np.asarray(out)
            if ref is None:
                ref = vis
                mism = 0
            else:
                mism = int((vis != ref).sum())
            print(f"{cname}  {jname:24s} {dt*1e3:8.1f} ms  mism={mism}",
                  flush=True)


if __name__ == "__main__":
    main()
