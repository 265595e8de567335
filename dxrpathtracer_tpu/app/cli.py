"""Command-line renderer — the app shell.

Replaces the reference's Win32 interactive app (App::Run message loop,
App.cpp:55-87) with an offline CLI; every AppSettings field is auto-exposed as
a flag (the settings registry generates the CLI the way the reference's
SettingsCompiler generates the ImGui editor — SURVEY.md §5.6), plus the HUD's
progress bar and Mrays/s estimate (DXRPathTracer.cpp:2132-2182) on stderr.

Commands:
  render — progressive path trace (or --raster forward mode) to PNG/NPY
  bake   — GI lightmap bake + optional denoise to PNG/NPY
  uvviz  — lightmap UV layout visualization (UVVisualizer.hlsl equivalent)
"""

import argparse
import dataclasses
import enum
import os
import sys
import time

import numpy as np

from .settings import AppSettings, Scenes


def _add_settings_flags(parser: argparse.ArgumentParser):
    for f in dataclasses.fields(AppSettings):
        name = "--" + f.name.replace("_", "-")
        default = f.default
        if isinstance(default, bool):
            parser.add_argument(name, type=lambda v: v.lower() in ("1", "true", "yes"),
                                default=None, metavar="BOOL")
        elif isinstance(default, enum.IntEnum):
            parser.add_argument(name, type=str, default=None,
                                help=f"one of {[e.name for e in type(default)]}")
        elif isinstance(default, (int, float)):
            parser.add_argument(name, type=type(default), default=None)
        elif isinstance(default, tuple):
            parser.add_argument(name, type=float, nargs=len(default), default=None)


def _settings_from_args(args) -> AppSettings:
    kw = {}
    for f in dataclasses.fields(AppSettings):
        v = getattr(args, f.name, None)
        if v is None:
            continue
        if isinstance(f.default, enum.IntEnum):
            v = type(f.default)[v] if isinstance(v, str) else type(f.default)(v)
        elif isinstance(f.default, tuple):
            v = tuple(v)
        kw[f.name] = v
    return AppSettings(**kw)


def _progress(i, total, t0, width, height, max_path_length):
    dt = max(time.time() - t0, 1e-6)
    rays = width * height * (1 + (max_path_length - 1) * 2) * (i + 1)
    mrays = rays / dt / 1e6
    bar = int(30 * (i + 1) / total)
    sys.stderr.write(f"\r[{'#' * bar}{'.' * (30 - bar)}] {i + 1}/{total} samples "
                     f"{mrays:7.1f} Mrays/s ")
    sys.stderr.flush()


def cmd_render(args):
    from .session import RenderSession
    from ..render.film import write_image

    settings = _settings_from_args(args)
    # --lightmap: the reference's EnableLightMapRender flow (Mesh.hlsl:155-162)
    # from a `bake --output FILE.npz` bundle (lightmap + the atlas tri UVs it
    # was baked against).
    lightmap = lightmap_uvs = None
    if getattr(args, "lightmap", None):
        bundle = np.load(args.lightmap)
        lightmap, lightmap_uvs = bundle["lightmap"], bundle["tri_uv"]
        settings = settings.replace(enable_light_map_render=True)
    t0 = time.time()
    sess = RenderSession(settings=settings, width=args.width, height=args.height)
    print(f"# scene={sess.preset.name} tris={sess.scene_host.num_triangles} "
          f"bvh_rows={sess.bvh.num_rows} init={time.time() - t0:.1f}s",
          file=sys.stderr)

    show_progress = args.progress and settings.show_progress_bar
    trace_ctx = None
    if getattr(args, "profile_trace", None):
        from .profiler import device_trace
        trace_ctx = device_trace(args.profile_trace)
        trace_ctx.__enter__()
        print(f"# jax.profiler trace -> {args.profile_trace}", file=sys.stderr)
    # EnableRayTracing=false selects the forward raster path
    # (DXRPathTracer::Render :1538-1559); --raster is shorthand for it.
    if args.raster or not settings.enable_ray_tracing:
        img = sess.render_raster_frame(shadow_mode=args.shadow_mode,
                                       lightmap=lightmap,
                                       lightmap_uvs=lightmap_uvs)
        from ..render.postfx import post_process
        s = sess.settings
        disp = post_process(img, s.exposure, s.bloom_exposure, s.bloom_magnitude,
                            s.bloom_blur_sigma)
    else:
        total = settings.total_samples
        t0 = time.time()
        while sess.sample_idx < total:
            sess.render_frame(force=True)
            if show_progress:
                sess.accum.block_until_ready()
                _progress(sess.sample_idx - 1, total, t0, args.width, args.height,
                          settings.max_path_length)
        sess.accum.block_until_ready()
        if show_progress:
            sys.stderr.write("\n")
        disp = sess.display_image()

    if trace_ctx is not None:
        trace_ctx.__exit__(None, None, None)
    write_image(args.output, np.asarray(disp))
    if args.save_hdr:
        # raw HDR accumulation: .exr or .npy by extension
        write_image(args.save_hdr, np.asarray(sess.accum))
    print(f"# wrote {args.output}", file=sys.stderr)


def cmd_animate(args):
    """Turntable animation with per-frame ON-DEVICE BVH rebuild.

    The dynamic-geometry flow the reference's GPU accel-structure builds
    enable (DXRPathTracer.cpp:2331-2488): every frame rigidly rotates the
    whole scene on device (scene/animate.py), rebuilds the LBVH on device
    (accel/device_build.py), and renders through the session's compiled
    step — same shapes and static metadata each frame, so nothing
    retraces and geometry never round-trips to the host.
    """
    import jax
    from .session import RenderSession
    from ..accel.device_build import build_table_device, lbvh_plan
    from ..accel.lbvh import WIDTH, FlatBVH
    from ..render.film import write_image
    from ..scene.animate import rotate_scene_y

    settings = _settings_from_args(args)
    t0 = time.time()
    sess = RenderSession(settings=settings, width=args.width, height=args.height)
    # Dynamic geometry routes every traversal through the per-frame
    # device-rebuilt W8 table; the W32/sunspace structures are host-built
    # accelerators for static scenes (render_sample falls back when None).
    sess.bvh2 = None
    sess.bvh_ray = None
    sess.sun_grid = None
    sess._tri_table = None
    sess._step = sess._build_step()

    plan = lbvh_plan(sess.scene_host.num_triangles)
    pos = np.asarray(sess.scene_host.positions)
    lo, hi = pos.min(axis=0), pos.max(axis=0)
    center = np.array([(lo[0] + hi[0]) / 2, 0.0, (lo[2] + hi[2]) / 2],
                      np.float32)

    @jax.jit
    def frame_geometry(scene, theta):
        sc = rotate_scene_y(scene, theta, center)
        v0 = sc.positions[sc.tri_idx[:, 0]]
        v1 = sc.positions[sc.tri_idx[:, 1]]
        v2 = sc.positions[sc.tri_idx[:, 2]]
        return sc, build_table_device(v0, v1, v2, plan)

    os.makedirs(args.output, exist_ok=True)
    print(f"# scene={sess.preset.name} tris={sess.scene_host.num_triangles} "
          f"frames={args.frames} spp={args.spp} init={time.time() - t0:.1f}s",
          file=sys.stderr)
    base_scene = sess.scene
    paths = []
    import jax.numpy as jnp
    for f in range(args.frames):
        theta = 2.0 * np.pi * f / args.frames
        sc, table = frame_geometry(base_scene, jnp.float32(theta))
        bvh = FlatBVH(table=table, num_rows=plan.num_rows,
                      num_tris=plan.num_tris, num_leaves=plan.num_leaves,
                      leaf_size=plan.leaf_size, max_depth=plan.depth + 2,
                      root_code=plan.root_code, width=WIDTH)
        sess.reset_accumulation()
        t1 = time.time()
        for s in range(args.spp):
            frame = sess.frame_constants(s)
            sess._accum_slabs = sess._step(sc, bvh, sess._accum_slabs,
                                           sess._sky_cube_dev, frame,
                                           sess.settings)
        sess.sample_idx = args.spp
        disp = np.asarray(sess.display_image())
        path = os.path.join(args.output, f"frame_{f:03d}.png")
        write_image(path, disp)
        paths.append(path)
        print(f"# frame {f + 1}/{args.frames} {(time.time() - t1) * 1e3:.0f} ms "
              f"-> {path}", file=sys.stderr)

    if args.gif:
        from PIL import Image
        ims = [Image.open(p) for p in paths]
        ims[0].save(args.gif, save_all=True, append_images=ims[1:],
                    duration=max(20, int(1000 / args.fps)), loop=0)
        print(f"# wrote {args.gif}", file=sys.stderr)


def cmd_bake(args):
    from .session import RenderSession
    from ..bake.baker import Baker
    from ..render.film import write_image, write_png
    from ..render.postfx import tone_map_filmic_alu
    from ..core.constants import FP16Scale

    settings = _settings_from_args(args)
    sess = RenderSession(settings=settings, width=8, height=8)
    baker = Baker(sess, resolution=args.resolution,
                  atlas_mode=getattr(args, "atlas", "charts"))
    ckpt = getattr(args, "checkpoint", None)
    if ckpt and os.path.exists(ckpt):
        baker.load_checkpoint(ckpt)
        print(f"# resumed bake at sample {baker.sample_index} from {ckpt}",
              file=sys.stderr)
    show_progress = args.progress and settings.show_progress_bar
    t0 = time.time()
    for i in range(baker.sample_index, args.samples):
        baker.bake_step()
        if show_progress:
            baker.accum.block_until_ready()
            _progress(i, args.samples, t0, args.resolution, args.resolution,
                      settings.max_path_length)
        if ckpt and (i + 1) % max(getattr(args, "checkpoint_every", 4), 1) == 0:
            baker.save_checkpoint(ckpt)
    if ckpt:
        baker.save_checkpoint(ckpt)
    if show_progress:
        sys.stderr.write("\n")
    lm = baker.denoised_lightmap(args.denoise) if args.denoise else baker.lightmap()
    arr = np.asarray(lm)
    if args.output.endswith(".npz"):
        # lit-render bundle: HDR lightmap + the atlas UVs it was baked
        # against, consumed by `render --raster --lightmap FILE.npz`
        uvs = (baker.atlas.tri_uv if hasattr(baker.atlas, "tri_uv")
               else baker.atlas.triangle_uvs())
        np.savez_compressed(args.output, lightmap=arr,
                            tri_uv=np.asarray(uvs))
    elif args.output.endswith((".npy", ".exr")):
        write_image(args.output, arr)
    else:
        disp = tone_map_filmic_alu(arr * (2.0 ** settings.exposure) / FP16Scale)
        write_png(args.output, np.asarray(disp))
    print(f"# wrote {args.output}", file=sys.stderr)


def cmd_uvviz(args):
    from ..render.uvviz import visualize_uvs
    from ..render.film import write_png
    from ..scene.registry import load_scene

    settings = _settings_from_args(args)
    scene, _ = load_scene(settings.current_scene)
    if getattr(args, "atlas", "charts") == "charts":
        import numpy as _np
        from ..bake.charts import build_charted_atlas
        atlas = build_charted_atlas(_np.asarray(scene.positions),
                                    _np.asarray(scene.tri_idx),
                                    ref_resolution=args.resolution)
    else:
        from ..bake.lightmap_uv import build_lightmap_atlas
        atlas = build_lightmap_atlas(int(scene.num_triangles))
    img = visualize_uvs(atlas, args.resolution)
    write_png(args.output, img)
    print(f"# wrote {args.output}", file=sys.stderr)


def main(argv=None):
    parser = argparse.ArgumentParser(prog="dxrpathtracer_tpu")
    sub = parser.add_subparsers(dest="command", required=True)

    p_render = sub.add_parser("render", help="progressive path trace to an image")
    p_render.add_argument("--width", type=int, default=1920)
    p_render.add_argument("--height", type=int, default=1080)
    p_render.add_argument("--output", type=str, default="render.png")
    p_render.add_argument("--save-hdr", type=str, default=None,
                          help="also save the raw HDR accumulation (.npy)")
    p_render.add_argument("--raster", action="store_true",
                          help="forward raster-mode path (EnableRayTracing=false)")
    p_render.add_argument("--shadow-mode", type=str, default="rays",
                          choices=["rays", "pcf", "evsm", "msm"],
                          help="raster sun shadows: exact rays, CSM depth "
                               "maps + PCF, or EVSM/MSM moment maps "
                               "(ShadowMapMode, ShadowHelper.h:25-108)")
    p_render.add_argument("--lightmap", type=str, default=None,
                          help="raster mode: render lightmap-lit from a "
                               "`bake --output FILE.npz` bundle (the "
                               "reference's EnableLightMapRender, "
                               "Mesh.hlsl:155-162)")
    p_render.add_argument("--progress", action="store_true", default=True)
    p_render.add_argument("--profile-trace", type=str, default=None,
                          help="capture a jax.profiler device trace of the "
                               "render into this directory (view in "
                               "TensorBoard/Perfetto — the PIX-capture "
                               "equivalent)")
    _add_settings_flags(p_render)
    p_render.set_defaults(fn=cmd_render)

    p_anim = sub.add_parser("animate",
                            help="turntable animation with per-frame "
                                 "on-device BVH rebuild (dynamic geometry)")
    p_anim.add_argument("--width", type=int, default=640)
    p_anim.add_argument("--height", type=int, default=360)
    p_anim.add_argument("--frames", type=int, default=24)
    p_anim.add_argument("--spp", type=int, default=4,
                        help="samples per animation frame")
    p_anim.add_argument("--output", type=str, default="anim",
                        help="output directory for frame_NNN.png")
    p_anim.add_argument("--gif", type=str, default=None,
                        help="also assemble the frames into a GIF")
    p_anim.add_argument("--fps", type=float, default=12.0)
    _add_settings_flags(p_anim)
    p_anim.set_defaults(fn=cmd_animate)

    p_bake = sub.add_parser("bake", help="bake a GI lightmap")
    p_bake.add_argument("--resolution", type=int, default=1024)
    p_bake.add_argument("--samples", type=int, default=64)
    p_bake.add_argument("--atlas", type=str, default="charts",
                        choices=["charts", "pairs"],
                        help="lightmap UV atlas: charted (xatlas-equivalent)"
                             " or the analytic per-triangle pair packer")
    p_bake.add_argument("--denoise", type=str, default=None,
                        choices=[None, "median", "atrous", "guided",
                                 "learned"])
    p_bake.add_argument("--output", type=str, default="lightmap.png")
    p_bake.add_argument("--checkpoint", type=str, default=None,
                        help="bake checkpoint .npz: resumed from if present, "
                             "written every --checkpoint-every samples (a "
                             "preempted 4096² bake continues where it left "
                             "off; SURVEY.md §5.4)")
    p_bake.add_argument("--checkpoint-every", type=int, default=4)
    p_bake.add_argument("--progress", action="store_true", default=True)
    _add_settings_flags(p_bake)
    p_bake.set_defaults(fn=cmd_bake)

    p_int = sub.add_parser("interactive",
                           help="interactive terminal viewer (App.cpp loop: "
                                "WASD camera, live HUD, progressive restart)")
    p_int.add_argument("--width", type=int, default=384)
    p_int.add_argument("--height", type=int, default=216)
    p_int.add_argument("--script", type=str, default=None,
                       help="headless input script 'key:frames,...' "
                            "(e.g. 'w:2,l:1,:4'); empty key = just render")
    p_int.add_argument("--max-frames", type=int, default=None)
    _add_settings_flags(p_int)

    def _cmd_interactive(args):
        from .interactive import cmd_interactive
        return cmd_interactive(args)

    p_int.set_defaults(fn=_cmd_interactive)

    p_uv = sub.add_parser("uvviz", help="visualize the lightmap UV layout")
    p_uv.add_argument("--resolution", type=int, default=1024)
    p_uv.add_argument("--atlas", type=str, default="charts",
                      choices=["charts", "pairs"])
    p_uv.add_argument("--output", type=str, default="uvs.png")
    _add_settings_flags(p_uv)
    p_uv.set_defaults(fn=cmd_uvviz)

    args = parser.parse_args(argv)
    # crash-dump capture around every command (the Aftermath analog,
    # app/crashdump.py): an unhandled dispatch failure persists a JSON
    # report of the session/settings/device state before exiting.
    from .crashdump import crash_guard
    with crash_guard():
        return args.fn(args)


if __name__ == "__main__":
    main()
