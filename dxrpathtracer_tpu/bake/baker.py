"""GI lightmap baker — the TPU-native Baking.hlsl pipeline.

Parity with RenderBakingPass/RenderBakingPass_Progressive + BakeRayGen
(DXRPathTracer.cpp:1845-2022, Baking.hlsl:336-466):
  1. surface maps at bake resolution (bake/surface_map.py),
  2. one cosine-hemisphere sample per covered texel per step (CMJ set 0,
     permutation = texelIdx; BakingCB.SampleIndex is the progressive counter),
  3. the sample is traced through the SAME wavefront integrator the interactive
     path uses (Baking.hlsl reuses RayTrace.hlsl's PathTrace), starting with
     PathLength 1, IsDiffuse = true, TMin = 1e-4, origin nudged 1e-5 along the
     ray,
  4. firefly clamp against 10x the running-mean luminance (Baking.hlsl:431-447),
  5. NaN + too-dark (luminance < 1e-4) sample rejection: accumulation holds
     (colorSum, validCount) and the lightmap is colorSum / validCount
     (Baking.hlsl:449-466),
  6. denoise: median 3x3 ("GPU Median Denoise") or the à-trous OIDN stand-in
     (render/denoise.py) — both fully on device, unlike the reference's
     GPU->CPU->GPU OIDN round trip.

The bake accumulation state {accum (S,S,4)} is an explicit array — progressive
bakes checkpoint/restart trivially (the reference can only stop/restart from
the UI, DXRPathTracer.cpp:2225-2240).
"""

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..app.settings import AppSettings
from ..core import cmj
from ..core.constants import FP32Max
from ..core.sampling import sample_cosine_hemisphere
from ..render.integrator import FrameConstants, trace_paths
from .lightmap_uv import build_lightmap_atlas
from .surface_map import build_surface_maps

LIGHTMAP_RESOLUTION = 4096  # reference default (DXRPathTracer.cpp:111)
FIREFLY_MULTIPLIER = 10.0   # Baking.hlsl:438
MIN_LUMINANCE = 1e-4        # Baking.hlsl:427
_LUMA = np.array([0.299, 0.587, 0.114], np.float32)

BAKE_TILE = 131072


def bake_sample(scene, bvh, sky_cube, settings: AppSettings, frame: FrameConstants,
                surface_pos, surface_nrm, accum, sample_index,
                row_offset=0, total_texels=None, sun_bvh=None, proxy=None):
    """One progressive bake step over a row-slab of texels.

    surface_pos: (R, S, 4) [xyz | coverage]; surface_nrm: (R, S, 3);
    accum: (R, S, 4) [colorSum | validCount]. Returns new accum.
    row_offset/total_texels keep CMJ texel indices GLOBAL when the lightmap
    is baked in row slabs (4096^2 = 16.8M rays cannot run as one program:
    multi-tile lax.map faults the device — PERF_NOTES.md).
    """
    s_rows, s_res = surface_pos.shape[0], surface_pos.shape[1]
    n = s_rows * s_res
    n_total = int(total_texels) if total_texels is not None else n
    f32 = jnp.float32

    pos = surface_pos[..., :3].reshape(n, 3)
    coverage = surface_pos[..., 3].reshape(n) > 0.0
    nrm = surface_nrm.reshape(n, 3)
    nrm_len2 = jnp.sum(nrm * nrm, axis=-1)
    covered = coverage & (nrm_len2 >= 1e-4)  # Baking.hlsl:363-369
    normal = nrm / jnp.sqrt(jnp.maximum(nrm_len2, 1e-20))[..., None]

    # TBN from the up-vector method (Baking.hlsl:376-379)
    up = jnp.where((jnp.abs(normal[:, 2]) < 0.999)[..., None],
                   jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], f32), (n, 3)),
                   jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0], f32), (n, 3)))
    tangent = jnp.cross(up, normal)
    tangent = tangent / jnp.maximum(jnp.linalg.norm(tangent, axis=-1, keepdims=True), 1e-12)
    bitangent = jnp.cross(normal, tangent)

    pixel_idx = (jnp.arange(n, dtype=jnp.uint32)
                 + jnp.uint32(row_offset) * jnp.uint32(s_res))
    sqrt_n = int(settings.sqrt_num_samples)
    u2 = cmj.sample_cmj_2d(sample_index, sqrt_n, sqrt_n, pixel_idx)
    dir_ts = sample_cosine_hemisphere(u2[..., 0], u2[..., 1])
    ray_dir = (dir_ts[:, 0:1] * tangent + dir_ts[:, 1:2] * bitangent
               + dir_ts[:, 2:3] * normal)
    ray_o = pos + ray_dir * 1e-5

    n_tiles = max(1, -(-n // BAKE_TILE))
    while n_tiles > 1 and n % n_tiles != 0:
        n_tiles += 1

    def trace(args):
        o, d, pix, act = args
        return trace_paths(scene, bvh, sky_cube, settings, frame,
                           o, d, jnp.full(o.shape[:1], FP32Max, f32), pix,
                           n_total, first_set_idx=1, initial_is_diffuse=True,
                           t_min0=1e-4, active0=act, sample_idx=sample_index,
                           sun_bvh=sun_bvh, proxy=proxy)

    if n_tiles > 1:
        tile = n // n_tiles
        radiance = jax.lax.map(trace, (
            ray_o.reshape(n_tiles, tile, 3), ray_dir.reshape(n_tiles, tile, 3),
            pixel_idx.reshape(n_tiles, tile), covered.reshape(n_tiles, tile)))
        radiance = radiance.reshape(n, 3)
    else:
        radiance = trace((ray_o, ray_dir, pixel_idx, covered))

    # --- firefly clamp + validity accumulation (Baking.hlsl:426-465) ---
    color_sum = accum[..., :3].reshape(n, 3)
    valid_count = accum[..., 3].reshape(n)
    luma = jnp.asarray(_LUMA)

    avg = color_sum / jnp.maximum(valid_count, 1.0)[..., None]
    avg_lum = jnp.sum(avg * luma, axis=-1) + 0.001
    smp_lum = jnp.sum(radiance * luma, axis=-1)
    clamp_scale = jnp.where(
        (valid_count >= 1.0) & (smp_lum > avg_lum * FIREFLY_MULTIPLIER),
        avg_lum * FIREFLY_MULTIPLIER / jnp.maximum(smp_lum, 1e-20), 1.0)
    new_sample = radiance * clamp_scale[..., None]

    is_nan = jnp.any(jnp.isnan(new_sample), axis=-1)
    lum = jnp.sum(new_sample * luma, axis=-1)
    valid = covered & ~is_nan & (lum >= MIN_LUMINANCE)

    color_sum = color_sum + jnp.where(valid[..., None], new_sample, 0.0)
    valid_count = valid_count + valid.astype(f32)
    return jnp.concatenate([color_sum, valid_count[..., None]], -1).reshape(s_rows, s_res, 4)


def lightmap_from_accum(accum):
    """colorSum / validCount (zero where no valid samples)."""
    count = accum[..., 3:4]
    return jnp.where(count > 0.0, accum[..., :3] / jnp.maximum(count, 1.0), 0.0)


class Baker:
    """Progressive bake session (the HUD 'Start Baking' flow,
    DXRPathTracer.cpp:2225-2240 + per-frame RenderBakingPass :1993-2022)."""

    # Rays per dispatched slab (same device limit as app/session.py).
    MAX_SLAB_RAYS = 4 * 131072

    def __init__(self, session, resolution: int = 512,
                 atlas_mode: str = "charts", atlas_opts: dict | None = None):
        self.session = session
        self.resolution = resolution
        if atlas_mode == "charts":
            # xatlas-equivalent charted atlas: area-proportional texel
            # density + packed charts (bake/charts.py; Model.cpp:608-719).
            # atlas_opts forwards packer knobs (the interactive preview uses
            # a fast low-grid config; offline bakes keep the defaults).
            from .charts import build_charted_atlas
            import numpy as np
            self.atlas = build_charted_atlas(
                np.asarray(session.scene_host.positions),
                np.asarray(session.scene_host.tri_idx),
                ref_resolution=resolution, **(atlas_opts or {}))
        else:
            self.atlas = build_lightmap_atlas(
                int(session.scene_host.num_triangles))
        self.surface_maps = build_surface_maps(session.scene_host, self.atlas,
                                               resolution)
        # Row-slab state: full-resolution bakes (the reference's 4096^2,
        # DXRPathTracer.cpp:111) dispatch one jit per row slab; each slab
        # accum is donated in place.
        rows = max(1, min(resolution, self.MAX_SLAB_RAYS // resolution))
        while resolution % rows != 0:
            rows -= 1
        self._slab_rows = rows
        self._row0 = list(range(0, resolution, rows))
        self._accum_slabs = [jnp.zeros((rows, resolution, 4), jnp.float32)
                             for _ in self._row0]
        self._pos_slabs = [self.surface_maps["position"][r:r + rows]
                           for r in self._row0]
        self._nrm_slabs = [self.surface_maps["normal"][r:r + rows]
                           for r in self._row0]
        self._row0_dev = [jnp.uint32(r) for r in self._row0]
        self.sample_index = 0
        self._step = self._build_step()

    @property
    def accum(self):
        if len(self._accum_slabs) == 1:
            return self._accum_slabs[0]
        return jnp.concatenate(self._accum_slabs, axis=0)

    @accum.setter
    def accum(self, value):
        value = jnp.asarray(value)
        rows = self._slab_rows
        self._accum_slabs = [value[r:r + rows] for r in self._row0]

    def _build_step(self):
        total = self.resolution * self.resolution

        @partial(jax.jit, static_argnames=("settings",), donate_argnums=(2,))
        def step(scene, bvh, accum, sky_cube, frame, pos, nrm, sample_index,
                 row0, sun_grid, proxy, settings):
            return bake_sample(scene, bvh, sky_cube, settings, frame,
                               pos, nrm, accum, sample_index,
                               row_offset=row0, total_texels=total,
                               sun_bvh=sun_grid, proxy=proxy)
        return step

    def bake_step(self):
        sess = self.session
        frame = sess.frame_constants(sess.sample_idx)
        for i in range(len(self._accum_slabs)):
            # Bake hemisphere rays are incoherent -> traced per-ray, where
            # the wide W32 table wins (tools/ab_wide_records.py); bit-exact.
            self._accum_slabs[i] = self._step(
                sess.scene, sess.bvh_ray, self._accum_slabs[i],
                sess._sky_cube_dev, frame, self._pos_slabs[i],
                self._nrm_slabs[i], jnp.uint32(self.sample_index),
                self._row0_dev[i], sess.sun_grid,
                getattr(sess, "proxy", None), sess.settings)
        self.sample_index += 1

    def checkpoint_state(self):
        """Bake checkpoint: {accum (S,S,4) sum+count, sample_index} — the
        reference keeps this state GPU-resident and can stop/resume baking
        from the HUD (DXRPathTracer.cpp:2225-2240); here it is an explicit
        pytree, so a 4096² bake survives preemption (SURVEY.md §5.4)."""
        from ..utils.transfer import device_to_host
        return {"accum": device_to_host(self.accum),
                "sample_index": self.sample_index}

    def restore_state(self, state):
        self.accum = jnp.asarray(state["accum"])
        self.sample_index = int(state["sample_index"])

    def save_checkpoint(self, path):
        import numpy as np
        st = self.checkpoint_state()
        np.savez_compressed(path, accum=st["accum"],
                            sample_index=st["sample_index"])

    def load_checkpoint(self, path):
        import numpy as np
        with np.load(path) as z:
            self.restore_state({"accum": z["accum"],
                                "sample_index": int(z["sample_index"])})

    def lightmap(self):
        return lightmap_from_accum(self.accum)

    def denoised_lightmap(self, mode: str = "median"):
        """median: DenoiseMedian.hlsl parity; atrous: unguided wavelet;
        guided: surface-map-guided joint bilateral; learned: the trained
        residual CNN (render/learned_denoise.py — the OIDN RTLightmap
        equivalent: same HDR+albedo+normal inputs, runs on device)."""
        from ..render.denoise import (atrous_denoise,
                                      guided_bilateral_denoise,
                                      median_filter_3x3)
        lm = self.lightmap()
        if mode == "median":
            return median_filter_3x3(lm)
        valid = self.accum[..., 3] > 0.0
        if mode == "guided":
            return guided_bilateral_denoise(
                lm, self.surface_maps["albedo"],
                self.surface_maps["normal"], valid=valid)
        if mode == "learned":
            from ..render.learned_denoise import learned_denoise
            return learned_denoise(lm, self.surface_maps["albedo"],
                                   self.surface_maps["normal"], valid=valid)
        return atrous_denoise(lm, valid=valid)
