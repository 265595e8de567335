#!/usr/bin/env python3
"""Benchmark: progressive path-trace frame time + Mrays/s on the current device.

Mirrors the reference's benchmark mode (DXRPathTracer.cpp:109,247-253 pins
settings; HUD Mrays/s formula at :2171-2174 is W*H*(1+(MaxPathLength-1)*2)/dt).
Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline (BASELINE.md): RTX 2080 renders 1080p Sponza-class scenes at
14-30 ms/frame, 1 spp/frame, path length 3 => ~660 Mrays/s. vs_baseline is
our Mrays/s / 660.

The real Sponza asset is gitignored out of the reference snapshot, so the
benchmark scene is the procedural Sponza-class stand-in (~246k triangles,
atrium occlusion structure) at the Sponza camera/sun preset.

Resilience: the tunneled TPU intermittently faults/hangs on large programs;
each resolution is attempted in a subprocess with a timeout, stepping down
until one completes. The achieved resolution is part of the metric string.
"""

import json
import os
import subprocess
import sys
import time

RESOLUTIONS = [(1920, 1080), (960, 540), (480, 270)]


def run_one(width, height, frames, scene_name):
    """Render in-process; prints a result dict as JSON on success."""
    import numpy as np
    from dxrpathtracer_tpu.app.session import RenderSession
    from dxrpathtracer_tpu.app.settings import AppSettings, Scenes

    scene = preset = None
    if scene_name == "SponzaAlpha":
        # alpha-test configuration (Timing.txt:6-8 axis): the Sponza-class
        # stand-in + foliage cards bound to SunTemple's real BC4 opacity map
        from dxrpathtracer_tpu.scene.registry import sponza_alpha_standin
        scene, preset = sponza_alpha_standin()
        settings_scene = Scenes.Sponza
    else:
        settings_scene = Scenes[scene_name]
    # benchmark_mode pins the no-convergence-stop behavior (the reference's
    # `static const bool Benchmark`, DXRPathTracer.cpp:109,247-253) while
    # keeping every traced constant at production defaults, so the bench
    # compiles the exact same programs a normal render uses.
    settings = AppSettings(current_scene=settings_scene,
                           benchmark_mode=True,
                           max_path_length=3)
    t0 = time.time()
    sess = RenderSession(settings=settings, width=width, height=height,
                         scene=scene, preset=preset)
    print(f"# init {time.time() - t0:.1f}s scene={scene_name} "
          f"tris={sess.scene_host.num_triangles} bvh_rows={sess.bvh.num_rows} "
          f"{width}x{height}", file=sys.stderr, flush=True)

    t0 = time.time()
    sess.render_frame()
    sess.accum.block_until_ready()
    print(f"# compile+first-frame {time.time() - t0:.1f}s", file=sys.stderr, flush=True)

    # Dispersion protocol (round 5): the old best-of-3 x 3-frame figure sat
    # inside the tunnel's documented +-25% session drift, so round-over-round
    # moves under ~10% were unresolvable (VERDICT r4). Now `trials` trials of
    # `frames` enqueued frames each; the reported number is the MEDIAN trial
    # and the metric string carries the relative spread (max-min)/median so
    # every consumer sees the instrument's resolution alongside the value.
    trials = int(os.environ.get("BENCH_TRIALS", 5))
    dts = []
    for _ in range(trials):
        t0 = time.time()
        for _ in range(frames):
            frame = sess.frame_constants(sess.sample_idx)
            sess._accum_slabs = sess._step(sess.scene, sess.bvh,
                                           sess._accum_slabs,
                                           sess._sky_cube_dev, frame,
                                           sess.settings)
            sess.sample_idx += 1
        # block_until_ready does not reliably synchronize on the tunneled
        # device; a tiny readback does (PERF_NOTES.md).
        float(sess._accum_slabs[-1][0, 0, 0])
        dts.append((time.time() - t0) / frames)
    med_dt = float(np.median(dts))
    spread = (max(dts) - min(dts)) / med_dt * 100.0

    # Chunked readback (large single transfers hang the tunneled device);
    # doubles as the deferred-device-fault detector.
    from dxrpathtracer_tpu.utils.transfer import device_to_host
    arr = device_to_host(sess.accum)
    assert np.isfinite(arr).all(), "benchmark render produced non-finite values"

    rays_per_frame = width * height * (1 + (settings.max_path_length - 1) * 2)
    mrays = rays_per_frame / med_dt / 1e6
    ms = med_dt * 1e3
    print(f"# {ms:.2f} ms/frame (median of {trials}x{frames}f, "
          f"spread {spread:.1f}%), {mrays:.1f} Mrays/s (estimate formula)",
          file=sys.stderr, flush=True)
    print(json.dumps({
        "metric": f"Mrays/s ({scene_name}-class {width}x{height}, path len "
                  f"{settings.max_path_length}, {ms:.2f} ms/frame "
                  f"±{spread:.1f}%)",
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / 660.0, 4),
    }))


def main():
    if os.environ.get("BENCH_CHILD"):
        run_one(int(os.environ["BENCH_WIDTH"]), int(os.environ["BENCH_HEIGHT"]),
                int(os.environ.get("BENCH_FRAMES", 10)),
                os.environ.get("BENCH_SCENE", "Sponza"))
        return

    scene = os.environ.get("BENCH_SCENE", "Sponza")
    frames = os.environ.get("BENCH_FRAMES", "10")
    if os.environ.get("BENCH_WIDTH"):
        resolutions = [(int(os.environ["BENCH_WIDTH"]), int(os.environ["BENCH_HEIGHT"]))]
    else:
        resolutions = RESOLUTIONS
    timeout_s = int(os.environ.get("BENCH_TIMEOUT", 1200))

    for width, height in resolutions:
        env = dict(os.environ, BENCH_CHILD="1", BENCH_WIDTH=str(width),
                   BENCH_HEIGHT=str(height), BENCH_FRAMES=frames,
                   BENCH_SCENE=scene)
        try:
            proc = subprocess.run([sys.executable, os.path.abspath(__file__)],
                                  env=env, capture_output=True, text=True,
                                  timeout=timeout_s,
                                  cwd=os.path.dirname(os.path.abspath(__file__)))
        except subprocess.TimeoutExpired:
            print(f"# {width}x{height} timed out; stepping down", file=sys.stderr)
            continue
        sys.stderr.write(proc.stderr)
        line = next((ln for ln in proc.stdout.splitlines()
                     if ln.startswith("{")), None)
        if proc.returncode == 0 and line:
            print(line)
            return
        print(f"# {width}x{height} failed (rc={proc.returncode}); stepping down",
              file=sys.stderr)
    print(json.dumps({"metric": "bench failed at all resolutions", "value": 0.0,
                      "unit": "Mrays/s", "vs_baseline": 0.0}))


if __name__ == "__main__":
    main()
