#!/usr/bin/env python3
"""Time the on-device LBVH build (accel/device_build.py) at bench scale on
the current device, vs the host builders. The reference logs its GPU
accel-structure build time the same way (DXRPathTracer.cpp:1499-1500).

Timing per PERF_NOTES: sync via a 4-byte readback, several invocations per
sync, best of N.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from dxrpathtracer_tpu.accel.device_build import (
    build_table_device, lbvh_plan)
from dxrpathtracer_tpu.accel import native
from dxrpathtracer_tpu.accel.lbvh import build_table_numpy
from dxrpathtracer_tpu.scene.registry import load_scene
from dxrpathtracer_tpu.app.settings import Scenes


def main():
    scene, _preset = load_scene(Scenes.Sponza)
    pos = np.asarray(scene.positions)
    tri = np.asarray(scene.tri_idx)
    v0, v1, v2 = pos[tri[:, 0]], pos[tri[:, 1]], pos[tri[:, 2]]
    T = v0.shape[0]
    print(f"scene tris={T}")

    # host builds
    t0 = time.time()
    packed = native.build_packed(v0, v1, v2, 12)
    t_native = time.time() - t0
    print(f"native C++ LBVH (morton) host build: {t_native*1e3:.1f} ms"
          if packed is not None else "native builder unavailable")
    t0 = time.time()
    host_table, *_ = build_table_numpy(v0, v1, v2)
    print(f"numpy LBVH host build: {(time.time()-t0)*1e3:.1f} ms")

    # device build
    plan = lbvh_plan(T)
    d0, d1, d2 = (jax.device_put(x) for x in (v0, v1, v2))
    fn = jax.jit(lambda a, b, c: build_table_device(a, b, c, plan))
    t0 = time.time()
    out = fn(d0, d1, d2)
    float(out[0, 0])
    print(f"device build compile+first: {time.time()-t0:.1f} s")

    best = float("inf")
    for _ in range(5):
        t0 = time.time()
        for _ in range(4):
            out = fn(d0, d1, d2)
        float(out[0, 0])
        best = min(best, (time.time() - t0) / 4)
    print(f"device build steady-state: {best*1e3:.1f} ms "
          f"({T/best/1e6:.1f} Mtris/s)")

    dev_table = np.asarray(out)
    same = (dev_table.view(np.int32) == host_table.view(np.int32)).all()
    print(f"bit-identical to host numpy build on this backend: {same}")
    if not same:
        diff = (dev_table.view(np.int32) != host_table.view(np.int32))
        print(f"  differing slots: {diff.sum()} / {diff.size} "
              f"(rows {np.unique(np.where(diff)[0]).size}) — expected off-CPU: "
              f"morton quantization rounds differently; validity check below")

    # validity: closest-hit through the device-built tree must match the
    # host-built tree's hits (t exactly comparable; tri ids can differ on
    # exact-t ties between the two traversal orders)
    from dxrpathtracer_tpu.accel.device_build import build_bvh_device
    from dxrpathtracer_tpu.accel.lbvh import build_bvh
    from dxrpathtracer_tpu.accel.traverse import closest_hit
    rng = np.random.default_rng(0)
    n = 8192
    lo, hi = pos.min(axis=0), pos.max(axis=0)
    o = rng.uniform(lo - 1, hi + 1, (n, 3)).astype(np.float32)
    tgt = rng.uniform(lo, hi, (n, 3)).astype(np.float32)
    d = tgt - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    bvh_dev = build_bvh_device(d0, d1, d2)
    bvh_host = build_bvh(v0, v1, v2, mode="morton")
    fn2 = jax.jit(lambda b, oo, dd: closest_hit(b, oo, dd, 0.0, 1e30))
    r_dev = fn2(bvh_dev, jnp.asarray(o), jnp.asarray(d))
    r_host = fn2(bvh_host, jnp.asarray(o), jnp.asarray(d))
    td, th = np.asarray(r_dev.t), np.asarray(r_host.t)
    md = np.asarray(r_dev.tri_id) >= 0
    mh = np.asarray(r_host.tri_id) >= 0
    assert (md == mh).all(), "hit/miss mask mismatch"
    assert np.allclose(td[md], th[mh], rtol=1e-5, atol=1e-6), "hit t mismatch"
    print(f"validity: {int(md.sum())}/{n} hits, t agrees with host-built tree")


if __name__ == "__main__":
    main()
