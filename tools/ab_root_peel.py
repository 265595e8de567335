#!/usr/bin/env python3
"""A/B: root-peel — first traversal step uses a BROADCAST root record
(static index, zero gather) instead of the all-lanes-same-row gather that
is this platform's measured worst gather case (microbench_onehot_top.py:
13.2 ms clipped-to-one-row vs 8.2 ms random at 518k lanes).

Production-faithful: Sponza-class stand-in, bounce rays in packet-tile lane
order from packet primary hits (the depth-2 population), per-ray W32 table,
plus the terminal any-hit population. Interleaved best-of, bit-exactness
checked.

Usage: python tools/ab_root_peel.py [WIDTH HEIGHT]
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

    def timed(fn, reps=5):
        out = fn()
        float(np.asarray(jax.tree.leaves(out)[0].ravel()[0]))
        ts = []
        for _ in range(reps):
            t0 = time.time()
            out = fn()
            float(np.asarray(jax.tree.leaves(out)[0].ravel()[0]))
            ts.append(time.time() - t0)
        return min(ts), out

    def jit_with_peel(make, peel):
        # env is read at TRACE time; toggle around the first call
        fn = jax.jit(make)
        os.environ["DXRPT_ROOT_PEEL"] = peel
        fn()  # trace + compile under this setting
        return fn

    results = {}
    for label, make in [
        ("bounce closest (W32)",
         lambda: trav.closest_hit(sess.bvh_ray, o_b, d_b, tmin, tmax, act)),
        ("terminal any (W32)",
         lambda: trav.any_hit(sess.bvh_ray, o_b, d_b, tmin, tmax, act)),
    ]:
        on = jit_with_peel(make, "1")
        off = jit_with_peel(make, "0")
        # wait: both jits trace lazily at first call inside jit_with_peel —
        # but jax.jit of the same python lambda re-traces per instance, so
        # each captured its own env setting.
        t_on1, out_on = timed(on)
        t_off1, out_off = timed(off)
        t_on2, _ = timed(on)
        t_off2, _ = timed(off)
        a = np.asarray(jax.tree.leaves(out_on)[0])
        b = np.asarray(jax.tree.leaves(out_off)[0])
        mism = int((a != b).sum())
        results[label] = (min(t_on1, t_on2), min(t_off1, t_off2), mism)

    print(f"root-peel A/B {width}x{height} ({int(hit1.sum())} active lanes):")
    for label, (t_on, t_off, mism) in results.items():
        print(f"  {label}: peel {t_on*1e3:7.1f} ms vs no-peel "
              f"{t_off*1e3:7.1f} ms ({(t_off/t_on - 1)*100:+.1f}%), "
              f"mismatches {mism}")


if __name__ == "__main__":
    main()
