#!/usr/bin/env python3
"""Ablate the non-traversal frame cost at a given resolution on the device.

frame_decompose.py attributes time across path segments; this tool splits the
SHADING side: texture taps (albedo/normal + the always-on metallic/roughness/
emissive), sky-cubemap miss sampling, NEE shading math, and the progressive
accumulation, by timing settings variants that disable each. Every variant is
its own compile (~1-2 min cold); run cache-warm where possible.

Usage: python tools/ablate_shading.py [WIDTH HEIGHT]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    width = int(sys.argv[1]) if len(sys.argv) > 1 else 960
    height = int(sys.argv[2]) if len(sys.argv) > 2 else 540

    from dxrpathtracer_tpu.app.session import RenderSession
    from dxrpathtracer_tpu.app.settings import AppSettings, Scenes

    def timed(settings):
        t0 = time.time()
        sess = RenderSession(settings=settings, width=width, height=height)
        sess.render_frame()
        float(np.asarray(sess.accum[0, 0, 0]))
        setup = time.time() - t0
        ts = []
        for _ in range(3):
            t0 = time.time()
            sess.render_frame()
            float(np.asarray(sess.accum[0, 0, 0]))
            ts.append(time.time() - t0)
        del sess
        return min(ts), setup

    base = dict(current_scene=Scenes.Sponza, sqrt_num_samples=100,
                max_path_length=3)
    variants = [
        ("default", {}),
        ("no albedo+normal maps", dict(enable_albedo_maps=False,
                                       enable_normal_maps=False)),
        ("no specular", dict(enable_specular=False)),
        ("no sun NEE", dict(enable_sun=False)),
        ("path len 1", dict(max_path_length=1)),
    ]
    results = {}
    for label, kw in variants:
        dt, setup = timed(AppSettings(**{**base, **kw}))
        results[label] = dt
        print(f"{label:24s} {dt*1e3:9.1f} ms/frame (setup {setup:.0f}s)",
              flush=True)

    d = results
    if "default" in d and "no albedo+normal maps" in d:
        print(f"\nalbedo+normal taps: {1e3*(d['default']-d['no albedo+normal maps']):.1f} ms")
    if "default" in d and "no sun NEE" in d:
        print(f"sun NEE (trav+shade): {1e3*(d['default']-d['no sun NEE']):.1f} ms")


if __name__ == "__main__":
    main()
