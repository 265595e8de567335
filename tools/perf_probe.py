#!/usr/bin/env python3
"""Traversal perf probe: time + phase-step breakdown on the current device.

Decomposes a frame into its traversal calls (closest-hit primary, any-hit
sun shadow, bounce closest-hit) on the Sponza-class stand-in, so perf work
targets the measured wall, not a guess. Timing uses a tiny readback for
synchronization (block_until_ready is unreliable on the tunneled TPU —
PERF_NOTES.md).

Usage: python tools/perf_probe.py [WIDTH HEIGHT]
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
    from dxrpathtracer_tpu.core.constants import FP32Max

    settings = AppSettings(current_scene=Scenes.Sponza, sqrt_num_samples=100,
                           max_path_length=3)
    sess = RenderSession(settings=settings, width=width, height=height)
    print(f"scene tris={sess.scene_host.num_triangles} "
          f"bvh_rows={sess.bvh.num_rows} {width}x{height}", flush=True)
    bvh = sess.bvh
    frame = sess.frame_constants(0)

    # Primary rays straight from the camera (same as render_sample raygen).
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
    o_d, d_d = jnp.asarray(o), jnp.asarray(d)
    tmax_d = jnp.asarray(ray_len.astype(np.float32))

    def timed(name, fn, *args):
        out = jax.jit(fn)(*args)
        leaves = jax.tree_util.tree_leaves(out)
        float(leaves[0].ravel()[0])  # sync: jax-slice THEN 4B transfer
        ts = []
        for _ in range(3):
            t0 = time.time()
            out = jax.jit(fn)(*args)
            leaves = jax.tree_util.tree_leaves(out)
            float(leaves[0].ravel()[0])
            ts.append(time.time() - t0)
        print(f"{name:32s} {min(ts)*1e3:9.1f} ms", flush=True)
        return out

    # 1. closest-hit primary with stats
    def ch_stats(o_, d_, tm_):
        return trav._traverse(bvh, o_, d_, jnp.zeros((n,), jnp.float32), tm_,
                              jnp.ones((n,), jnp.bool_), None, False, stats=True)

    rec, st = timed("closest_hit primary", ch_stats, o_d, d_d, tmax_d)
    pi = np.asarray(st["phase_iters"])
    sizes = st["sizes"]
    steps = np.diff(np.concatenate([[0], pi]))
    rows = (np.asarray(sizes) * steps).sum()
    print(f"  phases sizes={sizes}")
    print(f"  cumulative iters={pi.tolist()} per-phase steps={steps.tolist()}")
    print(f"  gathered rows={rows/1e6:.1f}M", flush=True)

    hit = np.asarray(rec.tri_id) >= 0
    print(f"  hit rate={hit.mean():.3f}")

    # 2. any-hit sun rays from the primary hit points
    pos = o + d * np.asarray(rec.t)[..., None]
    pos_d = jnp.asarray(pos.astype(np.float32))
    sun_d = jnp.broadcast_to(jnp.asarray(frame.sun_direction_ws), (n, 3))
    hit_d = jnp.asarray(hit)

    def ah_stats(p_, s_, h_):
        return trav._traverse(bvh, p_, s_,
                              jnp.full((n,), 1e-5, jnp.float32),
                              jnp.full((n,), FP32Max, jnp.float32),
                              h_, None, True, stats=True)

    rec2, st2 = timed("any_hit sun", ah_stats, pos_d, sun_d, hit_d)
    pi2 = np.asarray(st2["phase_iters"])
    steps2 = np.diff(np.concatenate([[0], pi2]))
    rows2 = (np.asarray(st2["sizes"]) * steps2).sum()
    print(f"  per-phase steps={steps2.tolist()} gathered rows={rows2/1e6:.1f}M")

    # 3. bounce rays (cosine-ish random dirs from hit points) closest-hit
    rng = np.random.default_rng(0)
    bd = rng.normal(size=(n, 3)).astype(np.float32)
    bd /= np.linalg.norm(bd, axis=-1, keepdims=True)

    def ch2_stats(p_, d_, h_):
        return trav._traverse(bvh, p_, d_,
                              jnp.full((n,), 1e-5, jnp.float32),
                              jnp.full((n,), FP32Max, jnp.float32),
                              h_, None, False, stats=True)

    rec3, st3 = timed("closest_hit bounce", ch2_stats, pos_d, jnp.asarray(bd), hit_d)
    pi3 = np.asarray(st3["phase_iters"])
    steps3 = np.diff(np.concatenate([[0], pi3]))
    rows3 = (np.asarray(st3["sizes"]) * steps3).sum()
    print(f"  per-phase steps={steps3.tolist()} gathered rows={rows3/1e6:.1f}M")

    # 4. whole frame for reference
    def frame_fn(scene, bvh_, accum, sky, fr):
        from dxrpathtracer_tpu.render.integrator import render_sample
        return render_sample(scene, bvh_, sky, settings, fr, width, height, accum)

    accum = jnp.zeros((height, width, 3), jnp.float32)
    timed("full frame (render_sample)", frame_fn, sess.scene, bvh, accum,
          sess._sky_cube_dev, frame)


if __name__ == "__main__":
    main()
