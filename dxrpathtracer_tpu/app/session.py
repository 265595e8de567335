"""RenderSession — the progressive render loop orchestrator.

The TPU-native equivalent of DXRPathTracer::Update/Render (DXRPathTracer.cpp:
1338-1563): owns the camera, settings, sky cache, accumulation state and the
jitted per-sample step. Restart logic mirrors the reference's watch list
(:1416-1461): any restart-relevant settings change, camera move, or
AlwaysResetPathTrace resets the accumulation to sample 0; rendering early-outs
at SqrtNumSamples^2 accumulated samples (:2026-2028).

Frame state is an explicit pytree {accum image, sample idx} — checkpointing a
progressive render is `np.save` (strictly better than the reference, whose
"resume state" lives in a GPU UAV; SURVEY.md §5.4).
"""

import os
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..accel.lbvh import build_bvh_for_scene
from ..app.settings import AppSettings, Scenes
from ..render.camera import FirstPersonCamera
from ..render.integrator import FrameConstants
from ..render.postfx import post_process
from ..scene.registry import PRESETS, load_scene
from ..sky.skycache import SkyCache
from .profiler import Profiler


@jax.jit
def _unpack_frame_constants(packed):
    """Slice the packed (25,) cbuffer upload into FrameConstants on-device."""
    return FrameConstants(
        inv_view_projection=packed[0:16].reshape(4, 4),
        camera_pos_ws=packed[16:19],
        sun_direction_ws=packed[19:22],
        sun_irradiance=packed[22:25],
        sun_render_color=packed[25:28],
        cos_sun_angular_radius=packed[28],
        sin_sun_angular_radius=packed[29],
        curr_sample_idx=packed[30].astype(jnp.uint32),
    )


class RenderSession:
    def __init__(self, settings: AppSettings | None = None,
                 width: int = 1920, height: int = 1080,
                 scene=None, preset=None):
        self.settings = settings or AppSettings()
        self.width = width
        self.height = height
        self.profiler = Profiler()

        # Accelerator compile-cache entries are host-portable; move the
        # persistent cache to the migration-stable per-backend dir before
        # the first compile (see dxrpathtracer_tpu.pin_backend_cache_dir).
        from .. import pin_backend_cache_dir
        pin_backend_cache_dir()

        if scene is None:
            scene, preset = load_scene(self.settings.current_scene)
        # Keep host numpy copies (BVH build reads them without device->host
        # readbacks, which are slow over the TPU tunnel); one batched
        # device_put moves the whole scene.
        self.scene_host = scene
        self.scene = jax.device_put(scene)
        self.preset = preset

        # Scene switch forces white-furnace mode (DXRPathTracer.cpp:934-935)
        if preset is not None:
            force_wf = preset.scene_enum == Scenes.WhiteFurnace
            self.settings = self.settings.replace(
                enable_white_furnace_mode=force_wf,
                sun_direction=tuple(preset.sun_direction),
                current_scene=preset.scene_enum)

        with self.profiler.cpu_scope("BuildAccelStructure"):
            pos = np.asarray(self.scene_host.positions)
            tri = np.asarray(self.scene_host.tri_idx)
            # flag_alpha marks alpha-material triangles in the W8 table's
            # leaf tri ids so the opaque-only walk of the split-table alpha
            # design can ignore them in-loop (no-op on opaque scenes)
            self.bvh = build_bvh_for_scene(self.scene_host, positions=pos,
                                           tri_idx=tri, flag_alpha=True)
            # Split-table alpha design (render/integrator.py
            # _split_alpha_closest): a TINY separate BVH over just the
            # alpha-material triangles. The K-candidate collection walk runs
            # on this table — its per-iteration buffer bookkeeping is only
            # affordable on a ~100-row walk, and punch-through fallback
            # rounds against it cost ms instead of a full-scene traversal.
            self.bvh_alpha = None
            if getattr(self.scene_host.materials, "any_opacity", False):
                from ..accel.lbvh import build_bvh
                tri_mat = np.asarray(self.scene_host.tri_material)
                has_op = np.asarray(self.scene_host.materials.has_opacity,
                                    bool)
                amask = has_op[tri_mat]
                if amask.any():
                    aidx = np.where(amask)[0].astype(np.int32)
                    atr = tri[aidx]
                    # leaf_size=2: a leaf can never hold more in-reach
                    # candidates than the walk's 2-per-leaf extraction, so
                    # in-leaf overflow is structurally impossible and every
                    # fallback lane can RESUME past its K-th candidate
                    # (exact) instead of punch-restarting. The table stays
                    # tiny (~500 rows for 768 card tris).
                    self.bvh_alpha = build_bvh(
                        pos[atr[:, 0]], pos[atr[:, 1]], pos[atr[:, 2]],
                        leaf_size=2,
                        tri_alpha=has_op[tri_mat],  # global mask, post-remap
                        tri_ids=aidx)
            # Second table for the PER-RAY traversals only: wide bf16-internal
            # W=32 records (same 512 B rows, 32-ary fanout) cut rows/ray ~35%
            # and measured 89 vs 129 ms on terminal any-hit at 960x540, while
            # packet traversals keep the classic W8 table (ordered-descent
            # packets measured SLOWER on W32: 88 vs 61.5 ms) — see
            # tools/ab_wide_records.py and trace_paths(ray_bvh=...). Results
            # are bit-exact either way. Costs one extra ~17 MB device table.
            self.bvh_ray = build_bvh_for_scene(self.scene, positions=pos,
                                               tri_idx=tri, width=32)
            # Dense-proxy pre-pass (accel/proxy.py): K largest opaque
            # triangles as a gather-free broadcast MT stage screening/
            # seeding the per-ray depth>=2 walks. ~5 KB; rebuilt only on
            # scene switch.
            self.proxy = None
            if self.settings.enable_dense_proxy:
                from ..accel.proxy import build_dense_proxy
                tri_alpha = None
                if getattr(self.scene_host.materials, "any_opacity", False):
                    tri_mat = np.asarray(self.scene_host.tri_material)
                    has_op = np.asarray(
                        self.scene_host.materials.has_opacity, bool)
                    tri_alpha = has_op[tri_mat]
                self.proxy = build_dense_proxy(
                    pos, tri, tri_alpha=tri_alpha,
                    k=int(os.environ.get("DXRPT_PROXY_K", "128")))
            # AABB-cut clear screen (accel/proxy.py): C morton-chunk covering
            # boxes as a broadcast constant; per-ray lanes that miss all of
            # them provably hit nothing and skip the walk (the complementary
            # definitely-CLEAR verdict — decisive on open-sky scenes where
            # the proxy's blocked fraction collapses). ~3 KB, scene-static.
            self.cut = None
            self.cut_clear_fraction = 0.0
            if self.settings.enable_clear_cut:
                from ..accel.proxy import build_aabb_cut, probe_clear_fraction
                cut = build_aabb_cut(
                    pos, tri, c=int(os.environ.get("DXRPT_CUT_C", "128")))
                if cut is not None:
                    # Scene-adaptive gate: the screen is pure per-lane VPU
                    # cost, so it only pays where a real fraction of
                    # surface-hemisphere rays provably escape (open-sky
                    # scenes). Measured (TIMING.md round 5): Sponza-class
                    # interior clears ~0 and LOSES 15.5 ms/frame; the
                    # SunTemple-class courtyard clears a large fraction and
                    # wins. Gate on a deterministic host probe of that
                    # fraction — same decision pattern as the raster's
                    # session threshold.
                    frac = probe_clear_fraction(cut, pos, tri)
                    self.cut_clear_fraction = frac
                    thresh = float(os.environ.get("DXRPT_CUT_MIN_CLEAR",
                                                  "0.10"))
                    if frac >= thresh:
                        self.cut = cut
            # Temporal hit-reuse table (accel/history.py): last sample's
            # per-pixel hit/occluder triangles seed depth-1 traversals with
            # exact t bounds. Default OFF: measured NET-NEGATIVE on the v5e
            # (370.9 vs 361.1 ms at 960x540 — the packet engine is
            # iteration/body bound, so the two 518k-row revalidation gathers
            # cost more than the tighter t_max saves; PERF_NOTES.md). Kept
            # as an exact, tested technique behind DXRPT_HISTORY=1.
            self._tri_table = None
            if os.environ.get("DXRPT_HISTORY"):
                from ..accel.history import build_tri_table
                self._tri_table = jax.device_put(build_tri_table(pos, tri))
            # Split fat-leaf tables for the MXU traversal (per-ray paths —
            # alpha test, incoherent fallbacks — still use self.bvh).
            self.bvh2 = None
            if self.settings.enable_mxu_traversal:
                from ..accel.lbvh import build_split_bvh
                self.bvh2 = build_split_bvh(pos[tri[:, 0]], pos[tri[:, 1]],
                                            pos[tri[:, 2]])

        self.camera = FirstPersonCamera(aspect=width / height)
        if preset is not None:
            self.camera.set_position(preset.camera_position)
            self.camera.set_x_rotation(preset.camera_rotation[0])
            self.camera.set_y_rotation(preset.camera_rotation[1])

        self.sky = SkyCache()
        self._sky_cube_dev = None
        self._update_sky()

        # Sun-space occlusion grid (accel/sunspace.py): rebuilt whenever the
        # sun direction changes (the reference's restart watch list analog —
        # sun moves restart accumulation anyway, DXRPathTracer.cpp:1416-1461).
        self.sun_grid = None
        self._sun_grid_key = None
        self._update_sun_grid()

        self.sample_idx = 0
        self._last_restart_key = None
        self._slab_h = self._slab_rows()
        # Software-raster primary visibility (render/swraster.py): host-
        # binned (tile, tri) pair lists, rebuilt whenever the camera moves
        # (a camera move restarts accumulation anyway — the same
        # amortization as the sun grid above).
        self._raster_slabs = None
        self._raster_key = None
        self._raster_tri_table = None
        self._update_raster()
        self.reset_accumulation()
        self._step = self._build_step()

        # crash-dump capture (Aftermath analog, app/crashdump.py): the CLI
        # guard resolves the active session through this registry
        from .crashdump import register_session
        register_session(self)

    # ------------------------------------------------------------------
    def _update_sun_grid(self):
        s = self.settings
        want = (s.enable_sunspace_shadows and s.enable_sun
                and not s.enable_white_furnace_mode)
        key = tuple(np.asarray(s.sun_direction, np.float32)) if want else None
        if key == self._sun_grid_key:
            return
        self._sun_grid_key = key
        if not want:
            self.sun_grid = None
            return
        from ..accel.sunspace import build_sun_grid_for_scene
        with self.profiler.cpu_scope("BuildSunGrid"):
            sun_dir = np.asarray(s.sun_direction, np.float32)
            self.sun_grid = build_sun_grid_for_scene(
                self.scene_host, sun_dir / np.linalg.norm(sun_dir),
                positions=np.asarray(self.scene_host.positions),
                tri_idx=np.asarray(self.scene_host.tri_idx))

    # Software-raster primaries: DEFAULT OFF since round 5. The round-4
    # per-slab A/B (2.7x on isolated primary visibility) did not survive
    # end-to-end measurement once the driver bench could resolve it
    # (dispersion protocol, 1080p Sponza-class, same session):
    #   raster ON  + proxy ON  1085.4 ms | raster OFF + proxy ON  1033.2
    #   raster ON  + proxy OFF 1218.9    | raster OFF + proxy OFF 1168.7
    # and SponzaAlpha@540p punch-with-raster-round-1 905.0 vs 864.0 plain —
    # a consistent ~50-135 ms NET LOSS at production shapes. The engine
    # stays correct and pinned (tests force engagement via
    # DXRPT_RASTER_MIN_PIXELS=1); re-A/B on future stacks via that knob.
    RASTER_MIN_PIXELS = 1 << 62

    def _update_raster(self):
        s = self.settings
        from ..render.integrator import _packet_tile_dims
        min_px = int(os.environ.get("DXRPT_RASTER_MIN_PIXELS",
                                    self.RASTER_MIN_PIXELS))
        slab_px = self._slab_h * self.width
        pk = _packet_tile_dims(self._slab_h, self.width)
        # Alpha scenes, two raster roles (round-5 A/B, TIMING.md):
        #   default (punch-through alpha): UNMASKED bins — every triangle,
        #   FORCE_OPAQUE semantics — serve the punch loop's depth-1 closest
        #   rounds (raster_closest_hit honors per-lane t_min, so resumed
        #   rounds are exact);
        #   DXRPT_SPLIT_ALPHA=1 (the round-4 design, measured 22% slower
        #   end-to-end): bins mask alpha triangles out and serve as the
        #   split design's opaque-only step.
        split_alpha = (bool(os.environ.get("DXRPT_SPLIT_ALPHA"))
                       and getattr(self, "bvh_alpha", None) is not None)
        want = (s.enable_sw_raster and s.enable_packet_traversal
                and slab_px >= min_px and slab_px % 128 == 0
                and pk is not None)
        key = ((self.camera.state_tuple(), self.width, self.height)
               if want else None)
        if key == self._raster_key:
            return
        self._raster_key = key
        if not want:
            self._raster_slabs = None
            return
        from ..accel.history import build_tri_table
        from ..render.swraster import (bin_pairs_host, build_raster_bins,
                                       pad_quantum, project_tri_bboxes)
        with self.profiler.cpu_scope("BuildRasterBins"):
            pos = np.asarray(self.scene_host.positions)
            tri = np.asarray(self.scene_host.tri_idx)
            if self._raster_tri_table is None:
                self._raster_tri_table = jax.device_put(
                    build_tri_table(pos, tri))
            ty, tx = pk
            vp = np.asarray(self.camera.view_projection(), np.float64)
            near = float(self.camera.near_clip)
            row0s = list(range(0, self.height, self._slab_h))
            bboxes = project_tri_bboxes(pos, tri, vp, near, self.width,
                                        self.height)
            opaque_only = False
            if self.scene_host.materials.any_opacity and split_alpha:
                tri_mat = np.asarray(self.scene_host.tri_material)
                has_op = np.asarray(self.scene_host.materials.has_opacity,
                                    bool)
                ok_mask, *rest_bb = bboxes
                bboxes = (ok_mask & ~has_op[tri_mat], *rest_bb)
                opaque_only = True
            built = [build_raster_bins(pos, tri, vp, near, self.width,
                                       self.height, self._slab_h, r0, ty,
                                       tx, self._raster_tri_table,
                                       bboxes=bboxes,
                                       opaque_only=opaque_only)[0]
                     for r0 in row0s]
            # one executable for all slabs: pad every slab to the max
            # (pair-tail, deep-tile) buckets
            pair_pad = max(b.pair_tri.shape[0] for b in built)
            deep_pad = max(b.deep_tiles.shape[0] for b in built)
            self._raster_slabs = [
                b if (b.pair_tri.shape[0] == pair_pad
                      and b.deep_tiles.shape[0] == deep_pad)
                else build_raster_bins(pos, tri, vp, near, self.width,
                                       self.height, self._slab_h, r0, ty,
                                       tx, self._raster_tri_table,
                                       pad_to=(pair_pad, deep_pad),
                                       bboxes=bboxes,
                                       opaque_only=opaque_only)[0]
                for b, r0 in zip(built, row0s)]

    def _update_sky(self):
        s = self.settings
        changed = self.sky.update(np.asarray(s.sun_direction, np.float32),
                                  s.sun_size, np.asarray(s.ground_albedo, np.float32),
                                  s.turbidity)
        if changed or self._sky_cube_dev is None:
            self._sky_cube_dev = jnp.asarray(self.sky.cubemap)
        return changed

    # Rays per jitted slab. Empirically the tunneled TPU device-faults on
    # programs whose internal ray-tile map exceeds ~4 tiles of ~128k rays
    # (integrator.TILE_RAYS); frames larger than that are split into row
    # slabs dispatched as separate jit calls.
    MAX_SLAB_RAYS = 4 * 131072

    def _slab_rows(self):
        n = self.width * self.height
        max_rays = int(os.environ.get("DXRPT_MAX_SLAB_RAYS",
                                      self.MAX_SLAB_RAYS))
        n_slabs = max(1, -(-n // max_rays))
        # (A 216-row/5-slab variant giving square-ish (8, 16) tiles was
        # A/B'd in round 4 and LOST end-to-end: the raster primary barely
        # cares about tile shape (16.1 ms at (2, 64) vs 15.2 at (8, 16))
        # while the extra slab costs ~60 ms of per-ray dispatch — bench
        # 1321.8 vs 1258.8 ms. Fewest slabs above MAX_SLAB_RAYS stands.)
        while n_slabs > 1 and self.height % n_slabs != 0:
            n_slabs += 1
        return self.height // n_slabs if n_slabs <= self.height else self.height

    def _build_step(self):
        """Returns step(scene, bvh, slabs, sky, frame, settings) -> slabs.

        Accumulation lives as a LIST of row-slab arrays so every slab's
        buffer is donated in place each sample; the old path re-sliced and
        concatenated a full-frame array every sample, defeating donation.

        Default is the single-program (monolithic) form. DXRPT_STAGED=1
        switches to StagedTracer — raygen / closest-hit / shading /
        batched-shadow / accumulate as separate jitted dispatches whose
        traversal executables compile once and are reused across depths,
        samples, and slabs. Measured on the tunneled v5e the monolith is
        ~25% faster per frame (1.09 s vs 1.40 s, 960x540 path-3): separate
        executable launches carry a large fixed cost on this runtime, and
        cold-compile times are comparable (PERF_NOTES.md). Staged remains
        the architecture the dense/binned traversal experiments need."""
        import os
        # Late-bound so a shader hot reload (app/hotreload.py) of the
        # integrator is picked up by rebuild_step() — the import re-resolves
        # against the reloaded module in sys.modules.
        from ..render.integrator import StagedTracer, raygen, render_sample

        slab_h = self._slab_h
        width, height = self.width, self.height

        bvh2 = self.bvh2

        bvh_ray = getattr(self, "bvh_ray", None)

        bvh_alpha = getattr(self, "bvh_alpha", None)

        tri_table = getattr(self, "_tri_table", None)

        proxy_c = getattr(self, "proxy", None)

        cut_c = getattr(self, "cut", None)

        if not os.environ.get("DXRPT_STAGED"):
            @partial(jax.jit, static_argnames=("settings",),
                     donate_argnums=(4, 5))
            def step_slab(scene, bvh, bvh2, bvh_ray, accum_slab, hist,
                          sky_cube, frame, row0, sun_grid, tri_tab, raster,
                          alpha_bvh, proxy, cut, settings):
                history = (None if tri_tab is None
                           else {**hist, "tri_table": tri_tab})
                out = render_sample(scene, bvh, sky_cube, settings, frame,
                                    width, slab_h, accum_slab,
                                    row_offset=row0, total_height=height,
                                    bvh2=bvh2, sun_bvh=sun_grid,
                                    ray_bvh=bvh_ray, history=history,
                                    raster=raster, alpha_bvh=alpha_bvh,
                                    proxy=proxy, cut=cut)
                if history is None:
                    return out, hist
                accum_out, hist_out = out
                return accum_out, {"prim_tri": hist_out["prim_tri"],
                                   "sun_tri": hist_out["sun_tri"]}
        else:
            tracer = StagedTracer()

            @partial(jax.jit, static_argnames=("settings",))
            def raygen_slab(frame, row0, settings):
                return raygen(settings, frame, width, slab_h, row0, height)

            @partial(jax.jit, donate_argnums=(0,))
            def accum_slab_fn(accum_slab, radiance, frame):
                f32 = jnp.float32
                radiance = radiance.reshape(slab_h, width, 3)
                lerp = (frame.curr_sample_idx.astype(f32)
                        / (frame.curr_sample_idx.astype(f32) + 1.0))
                return radiance + (accum_slab - radiance) * lerp

            def step_slab(scene, bvh, _bvh2, _bvh_ray, accum_slab, hist,
                          sky_cube, frame, row0, _sun_grid, _tri_tab,
                          _raster, _alpha_bvh, _proxy, _cut, settings):
                o, d, length, pix = raygen_slab(frame, row0, settings)
                radiance = tracer.trace(scene, bvh, sky_cube, settings, frame,
                                        o, d, length, pix, width * height,
                                        first_set_idx=1)
                return accum_slab_fn(accum_slab, radiance, frame), hist

        # Device-resident row offsets, transferred ONCE: a fresh host scalar
        # per dispatch serializes on the tunnel RTT (~10 ms each).
        row0_dev = [jnp.int32(r0) for r0 in range(0, height, slab_h)]

        def step(scene, bvh, slabs, sky_cube, frame, settings):
            rasters = (self._raster_slabs
                       or [None] * len(slabs))
            outs = [step_slab(scene, bvh, bvh2, bvh_ray, slab, hist,
                              sky_cube, frame, r0, self.sun_grid, tri_table,
                              raster, bvh_alpha, proxy_c, cut_c, settings)
                    for slab, hist, r0, raster in zip(slabs,
                                                      self._hist_slabs,
                                                      row0_dev, rasters)]
            self._hist_slabs = [o[1] for o in outs]
            return [o[0] for o in outs]

        return step

    def frame_constants(self, sample_idx: int) -> FrameConstants:
        """Per-frame cbuffer upload. All scalars/vectors are PACKED into one
        host array and transferred in a single device_put: each individual
        fresh-host-value transfer serializes on the tunnel RTT (~10 ms), so
        eight separate uploads would cost ~80 ms/frame."""
        s = self.settings
        sun_dir = np.asarray(s.sun_direction, np.float32)
        sun_dir = sun_dir / np.linalg.norm(sun_dir)
        ang = np.deg2rad(s.sun_size)
        packed = np.concatenate([
            np.asarray(self.camera.inv_view_projection(), np.float32).ravel(),
            np.asarray(self.camera.position, np.float32),
            sun_dir,
            np.asarray(self.sky.sun_irradiance, np.float32),
            np.asarray(self.sky.sun_render_color, np.float32),
            np.asarray([np.cos(ang), np.sin(ang), float(sample_idx)],
                       np.float32),
        ])
        return _unpack_frame_constants(jnp.asarray(packed))

    # ------------------------------------------------------------------
    def update(self):
        """Per-frame update: sky rebuild + restart detection
        (DXRPathTracer::Update, :1338-1461)."""
        self._update_sky()
        self._update_sun_grid()
        self._update_raster()
        key = (self.settings.restart_key(), self.camera.state_tuple(),
               self.width, self.height)
        if key != self._last_restart_key or self.settings.always_reset_path_trace:
            self._last_restart_key = key
            self.reset_accumulation()

    def rebuild_step(self):
        """Hot-reload hook: rebuild the jitted per-sample step from the
        CURRENT module code and restart the progressive accumulation — the
        analog of the reference re-creating its PSOs after a shader reload
        (App.cpp:231-237) plus the implied path-trace restart."""
        self._step = self._build_step()
        self.reset_accumulation()

    def reset_accumulation(self):
        self._accum_slabs = [jnp.zeros((self._slab_h, self.width, 3), jnp.float32)
                             for _ in range(0, self.height, self._slab_h)]
        # temporal hit-reuse state resets with the accumulation (-1 = no
        # prediction; stale ids would still be EXACT, just slower)
        n_lane = self._slab_h * self.width
        self._hist_slabs = [{"prim_tri": jnp.full((n_lane,), -1, jnp.int32),
                             "sun_tri": jnp.full((n_lane,), -1, jnp.int32)}
                            for _ in range(0, self.height, self._slab_h)]
        self.sample_idx = 0

    @property
    def accum(self):
        """Full-frame accumulation image (concatenates the row slabs)."""
        if len(self._accum_slabs) == 1:
            return self._accum_slabs[0]
        return jnp.concatenate(self._accum_slabs, axis=0)

    @accum.setter
    def accum(self, img):
        img = jnp.asarray(img)
        self._accum_slabs = [img[r0:r0 + self._slab_h]
                             for r0 in range(0, self.height, self._slab_h)]

    @property
    def done(self) -> bool:
        if self.settings.benchmark_mode:
            return False  # DXRPathTracer.cpp:109 Benchmark: never converge
        return self.sample_idx >= self.settings.total_samples

    def render_frame(self, force: bool = False) -> bool:
        """Render one progressive sample; returns False if converged
        (early-out at SqrtNumSamples^2, DXRPathTracer.cpp:2026-2028)."""
        self.update()
        if self.done and not force:
            return False
        frame = self.frame_constants(self.sample_idx)
        with self.profiler.gpu_scope("RenderRayTracing") as scope:
            self._accum_slabs = self._step(self.scene, self.bvh,
                                           self._accum_slabs,
                                           self._sky_cube_dev, frame,
                                           self.settings)
            scope.result = self._accum_slabs[-1]
        self.sample_idx += 1
        return True

    def render_to_completion(self, max_samples: int | None = None):
        n = max_samples or self.settings.total_samples
        while self.sample_idx < n:
            frame = self.frame_constants(self.sample_idx)
            self._accum_slabs = self._step(self.scene, self.bvh,
                                           self._accum_slabs,
                                           self._sky_cube_dev, frame,
                                           self.settings)
            self.sample_idx += 1
        return self.accum

    # ------------------------------------------------------------------
    def render_raster_frame(self, lightmap=None, lightmap_uvs=None,
                            shadow_mode: str = "rays",
                            shadow_map_size: int = 512):
        """One forward-rendered frame (EnableRayTracing=false path,
        DXRPathTracer::Render :1538-1559): cluster binning + ray-cast forward
        shading + skybox + weighted resolve. Returns (H, W, 3) radiance.

        shadow_mode: "rays" (exact BVH shadow rays), "pcf" (per-frame
        cascade depth maps + 7x7 PCF — the reference's shipped sun-shadow
        path, MeshRenderer.cpp:534-565 + Shadows.hlsl:318-360), or
        "evsm"/"msm" (moment shadow maps: the same cascade depth maps
        converted per SMConvert.hlsl, box-filtered, and sampled with the
        Chebyshev / 4-moment Hamburger bound — ShadowMapMode::EVSM/::MSM,
        ShadowHelper.h:25-108; spot lights use PCF in those modes, matching
        the reference app's plain-depth spot maps)."""
        from ..render.clusters import build_cluster_masks, froxel_bounding_spheres
        from ..render.raster import forward_render

        self._update_sky()
        sun_shadow_pcf = None
        spot_shadow_pcf = None
        if shadow_mode in ("pcf", "evsm", "msm"):
            from ..app.settings import SPOT_SHADOW_NEAR_CLIP
            from ..render.integrator import _make_alpha_test
            from ..render.shadows import (prepare_cascades,
                                          prepare_spot_shadows,
                                          render_cascade_depth_maps,
                                          render_spot_depth_maps)
            accept = _make_alpha_test(self.scene, self.settings)
            sun_dir = np.asarray(self.settings.sun_direction, np.float32)
            cascades = prepare_cascades(self.camera,
                                        sun_dir / np.linalg.norm(sun_dir),
                                        map_size=shadow_map_size)
            with self.profiler.gpu_scope("RenderSunShadowMap") as scope:
                depth_maps = render_cascade_depth_maps(
                    self.bvh_ray, cascades, shadow_map_size,
                    accept_fn=accept)
                scope.result = depth_maps
            if shadow_mode in ("evsm", "msm"):
                from ..render.shadows import (convert_depth_maps,
                                              filter_moment_maps)
                with self.profiler.gpu_scope("ConvertShadowMap") as scope:
                    moments = filter_moment_maps(
                        convert_depth_maps(depth_maps, shadow_mode))
                    scope.result = moments
                sun_shadow_pcf = (moments, cascades, shadow_mode)
            else:
                sun_shadow_pcf = (depth_maps, cascades)
            if self.scene_host.lights.num_lights > 0:
                # per-spot perspective depth + the same PCF kernel
                # (MeshRenderer.cpp:568-608)
                spots = prepare_spot_shadows(self.scene_host.lights,
                                             SPOT_SHADOW_NEAR_CLIP)
                with self.profiler.gpu_scope("RenderSpotShadowMap") as scope:
                    spot_maps = render_spot_depth_maps(
                        self.bvh_ray, spots,
                        min(shadow_map_size * 2, 1024), accept_fn=accept)
                    scope.result = spot_maps
                spot_shadow_pcf = (spot_maps, spots)
        spheres, dims = froxel_bounding_spheres(self.width, self.height, self.camera)
        with self.profiler.gpu_scope("RenderClusters") as scope:
            masks = build_cluster_masks(
                jax.device_put(self.scene.lights), spheres,
                mode=self.settings.cluster_rasterization_mode)
            scope.result = masks
        frame = self.frame_constants(self.sample_idx)
        sky_sh = jnp.asarray(self.sky.sh9) if self.sky.sh9 is not None else None
        with self.profiler.gpu_scope("RenderForward") as scope:
            img = scope.result = forward_render(
                self.scene, self.bvh_ray, self._sky_cube_dev, sky_sh,
                self.settings, frame, self.width, self.height,
                masks, dims, self.camera.forward(),
                self.camera.near_clip, self.camera.far_clip,
                lightmap=lightmap, lightmap_uvs=lightmap_uvs,
                sun_shadow_pcf=sun_shadow_pcf,
                spot_shadow_pcf=spot_shadow_pcf)
        return img

    def display_image(self):
        """Tone-mapped display output (PostProcessor::Render)."""
        s = self.settings
        return post_process(self.accum, s.exposure, s.bloom_exposure,
                            s.bloom_magnitude, s.bloom_blur_sigma)

    def display_thumbnail(self, cols: int, rows: int):
        """Device-side downsampled tone-mapped uint8 preview for the
        interactive present: the terminal needs <= ~120x112 pixels, so
        tone-map a strided subsample ON DEVICE and read back ~40 KB instead
        of the full HDR frame (a full-frame np.asarray costs ~1 s at
        960x540 over the ~40 MB/s tunnel; PERF_NOTES.md). Bloom is skipped
        in the preview (it needs the full-res image; screenshots still use
        display_image). Returns a device (rows, cols, 3) uint8 array."""
        key = (cols, rows)
        if getattr(self, "_thumb_key", None) != key:
            ys = np.linspace(0, self.height - 1, rows).astype(np.int32)
            xs = np.linspace(0, self.width - 1, cols).astype(np.int32)
            self._thumb_ys = jnp.asarray(ys)
            self._thumb_xs = jnp.asarray(xs)
            self._thumb_key = key

            @jax.jit
            def thumb(slabs, exposure):
                from ..render.postfx import tone_map_filmic_alu
                from ..core.constants import FP16Scale
                img = slabs[0] if len(slabs) == 1 else jnp.concatenate(
                    slabs, axis=0)
                small = jnp.take(jnp.take(img, self._thumb_ys, axis=0),
                                 self._thumb_xs, axis=1)
                disp = tone_map_filmic_alu(
                    small * (2.0 ** exposure) / FP16Scale)
                return jnp.clip(disp * 255.0, 0.0, 255.0).astype(jnp.uint8)

            self._thumb_fn = thumb
        return self._thumb_fn(self._accum_slabs,
                              jnp.float32(self.settings.exposure))

    def checkpoint_state(self):
        """Progressive-render checkpoint: {accum, sample_idx} (SURVEY.md §5.4)."""
        from ..utils.transfer import device_to_host
        return {"accum": device_to_host(self.accum), "sample_idx": self.sample_idx}

    def restore_state(self, state):
        self.accum = jnp.asarray(state["accum"])
        self.sample_idx = int(state["sample_idx"])
        self._last_restart_key = (self.settings.restart_key(),
                                  self.camera.state_tuple(),
                                  self.width, self.height)
