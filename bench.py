#!/usr/bin/env python3
"""Benchmark: progressive path-trace frame time + Mrays/s on the current device.

Mirrors the reference's benchmark mode (DXRPathTracer.cpp:109,247-253 pins
settings; HUD Mrays/s formula at :2171-2174 is W*H*(1+(MaxPathLength-1)*2)/dt).
Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline (BASELINE.md): RTX 2080 renders 1080p Sponza-class scenes at
14-30 ms/frame, 1 spp/frame, path length 3 => ~660 Mrays/s. vs_baseline is
our Mrays/s / 660.

The real Sponza asset is gitignored out of the reference snapshot, so the
benchmark scene is the procedural Sponza-class stand-in (~260k triangles,
atrium occlusion structure) at the Sponza camera/sun preset.
"""

import json
import os
import sys
import time

import numpy as np


def main():
    width = int(os.environ.get("BENCH_WIDTH", 1920))
    height = int(os.environ.get("BENCH_HEIGHT", 1080))
    frames = int(os.environ.get("BENCH_FRAMES", 8))
    scene_name = os.environ.get("BENCH_SCENE", "Sponza")

    from dxrpathtracer_tpu.app.session import RenderSession
    from dxrpathtracer_tpu.app.settings import AppSettings, Scenes

    settings = AppSettings(current_scene=Scenes[scene_name],
                           sqrt_num_samples=100,  # don't early-out during bench
                           max_path_length=3)
    t0 = time.time()
    sess = RenderSession(settings=settings, width=width, height=height)
    init_s = time.time() - t0
    print(f"# init {init_s:.1f}s scene={scene_name} tris={sess.scene.num_triangles} "
          f"bvh_nodes={sess.bvh.num_nodes} {width}x{height}", file=sys.stderr)

    # Warmup / compile
    t0 = time.time()
    sess.render_frame()
    sess.accum.block_until_ready()
    print(f"# compile+first-frame {time.time() - t0:.1f}s", file=sys.stderr)

    # Timed frames
    t0 = time.time()
    for _ in range(frames):
        frame = sess.frame_constants(sess.sample_idx)
        sess.accum = sess._step(sess.scene, sess.bvh, sess.accum,
                                sess._sky_cube_dev, frame, sess.settings)
        sess.sample_idx += 1
    sess.accum.block_until_ready()
    dt = (time.time() - t0) / frames

    arr = np.asarray(sess.accum)
    assert np.isfinite(arr).all(), "benchmark render produced non-finite values"

    # Reference HUD ray-count estimate (DXRPathTracer.cpp:2171-2174)
    rays_per_frame = width * height * (1 + (settings.max_path_length - 1) * 2)
    mrays = rays_per_frame / dt / 1e6
    ms = dt * 1e3
    print(f"# {ms:.2f} ms/frame, {mrays:.1f} Mrays/s (estimate formula)",
          file=sys.stderr)

    print(json.dumps({
        "metric": f"Mrays/s ({scene_name}-class {width}x{height}, path len "
                  f"{settings.max_path_length}, {ms:.1f} ms/frame)",
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / 660.0, 4),
    }))


if __name__ == "__main__":
    main()
