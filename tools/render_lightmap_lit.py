#!/usr/bin/env python3
"""Bake a lightmap and render the lightmap-lit raster view in one go.

The reference's EnableLightMapRender flow: bake (Baking.hlsl) -> forward
pass samples the baked lightmap instead of live lighting
(Mesh.hlsl:155-162). This tool drives the same end-to-end flow here and
writes both the lightmap preview and the lit raster frame (the committed
version of the script that produced artifacts/theinn_lightmap_lit_raster.png).

Usage:
  python tools/render_lightmap_lit.py --scene Stronghold --resolution 1024 \
      --samples 8 --denoise guided --width 960 --height 540 \
      --output artifacts/theinn_lightmap_lit_raster.png
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--scene", default="Stronghold")
    ap.add_argument("--resolution", type=int, default=1024)
    ap.add_argument("--samples", type=int, default=8)
    ap.add_argument("--denoise", default="guided",
                    choices=["none", "median", "atrous", "guided"])
    ap.add_argument("--width", type=int, default=960)
    ap.add_argument("--height", type=int, default=540)
    ap.add_argument("--output", default="lightmap_lit.png")
    ap.add_argument("--lightmap-output", default=None,
                    help="also write the lightmap preview PNG here")
    ap.add_argument("--cpu", action="store_true",
                    help="pin the CPU backend (jax.config, not env — the "
                         "env var is ignored on this host)")
    args = ap.parse_args(argv)

    if args.cpu:
        # XLA:CPU persistent-cache entries are host-AOT binaries and this
        # machine has a history of foreign-feature loads with silently
        # wrong numerics (PERF_NOTES.md) — run CPU renders cache-off,
        # exactly like tests/conftest.py.
        os.environ["DXRPT_NO_COMPILATION_CACHE"] = "1"

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from dxrpathtracer_tpu.app.session import RenderSession
    from dxrpathtracer_tpu.app.settings import AppSettings, Scenes
    from dxrpathtracer_tpu.bake.baker import Baker
    from dxrpathtracer_tpu.core.constants import FP16Scale
    from dxrpathtracer_tpu.render.film import write_png
    from dxrpathtracer_tpu.render.postfx import tone_map_filmic_alu
    from dxrpathtracer_tpu.utils.transfer import device_to_host

    settings = AppSettings(current_scene=Scenes[args.scene],
                           enable_light_map_render=True)
    sess = RenderSession(settings=settings, width=args.width,
                         height=args.height)

    t0 = time.time()
    baker = Baker(sess, resolution=args.resolution)
    print(f"# atlas+surface maps {time.time() - t0:.1f}s "
          f"(coverage {getattr(baker.atlas, 'coverage', float('nan')):.3f})",
          file=sys.stderr, flush=True)
    t0 = time.time()
    for i in range(args.samples):
        baker.bake_step()
    lm = (baker.lightmap() if args.denoise == "none"
          else baker.denoised_lightmap(args.denoise))
    lm.block_until_ready()
    print(f"# bake {args.samples} samples {time.time() - t0:.1f}s",
          file=sys.stderr, flush=True)

    if args.lightmap_output:
        disp = tone_map_filmic_alu(
            lm * (2.0 ** settings.exposure) / FP16Scale)
        write_png(args.lightmap_output, device_to_host(disp))
        print(f"# wrote {args.lightmap_output}", file=sys.stderr)

    t0 = time.time()
    uvs = baker.atlas.tri_uv if hasattr(baker.atlas, "tri_uv") else None
    img = sess.render_raster_frame(lightmap=lm, lightmap_uvs=uvs)
    disp = tone_map_filmic_alu(img * (2.0 ** settings.exposure) / FP16Scale)
    out = device_to_host(disp)
    assert np.isfinite(out).all()
    write_png(args.output, out)
    print(f"# lit raster {time.time() - t0:.1f}s -> {args.output}",
          file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
