#!/usr/bin/env python3
"""Render the committed oracle images (render/oracle.py) for all presets.

The oracle is a deliberately naive recursive numpy path tracer implementing
RayTrace.hlsl's semantics independently of the engine (shared pieces: scene
loading and the CMJ sampler — shared streams make agreement per-sample, not
just in expectation). This tool renders each preset at 64x64 with the
preset's default settings and saves the images to tests/oracle/, where
tests/test_oracle.py pins the ENGINE against them (the substitute for the
unobtainable reference converged images — BASELINE.md, VERDICT r3 #4).

Run on any host (numpy only; the oracle never touches the accelerator):
    python tools/oracle_render.py [--scenes A,B] [--res 64] [--samples 4]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes",
                    default="BoxTest,WhiteFurnace,Sponza,SunTemple,Stronghold")
    ap.add_argument("--res", type=int, default=64)
    ap.add_argument("--samples", type=int, default=4)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")  # scene loading only
    from dxrpathtracer_tpu.app.session import RenderSession
    from dxrpathtracer_tpu.app.settings import AppSettings, Scenes
    from dxrpathtracer_tpu.render.oracle import OracleRenderer

    out_dir = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "oracle")
    os.makedirs(out_dir, exist_ok=True)

    sq = int(round(args.samples ** 0.5))
    assert sq * sq == args.samples, "--samples must be a square (CMJ set)"
    for name in args.scenes.split(","):
        t0 = time.time()
        sess = RenderSession(
            settings=AppSettings(current_scene=Scenes[name],
                                 sqrt_num_samples=sq),
            width=args.res, height=args.res)
        orc = OracleRenderer(sess.scene_host, sess.settings, sess.camera,
                             sess.sky.cubemap, sess.sky.sun_irradiance,
                             sess.sky.sun_render_color)
        img = orc.render(args.res, args.res, args.samples)
        assert np.isfinite(img).all()
        path = os.path.join(out_dir,
                            f"{name.lower()}_{args.res}_{args.samples}.npy")
        np.save(path, img.astype(np.float32))
        print(f"{name}: {path} mean {img.mean():.4f} "
              f"({time.time() - t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
