"""Wavefront path-tracing integrator — the TPU-native RayTrace.hlsl.

The reference's recursive megakernel (RayGen -> ClosestHit -> PathTrace ->
recursive TraceRay, DXRPathTracer/RayTrace.hlsl:92-441) becomes a statically
unrolled wavefront loop: path depth is the outer Python loop (static because
MaxPathLength is a static setting, so XLA sees straight-line code), with the
whole pixel wavefront carried as SoA arrays. The recursion's multiplicative
composition `radiance += throughput * child` unrolls into a carried path
throughput `beta` with `total += beta * local`.

Semantics parity checklist vs RayTrace.hlsl (each implemented below):
  - CMJ sample points: primary = set 0, bounce k = set k; permutation =
    set * TotalNumPixels + pixelIdx (RayTrace.hlsl:85-90)
  - primary ray un-projection through InvViewProjection with y-flip (:100-112)
  - miss: sky cubemap sample, sun-disc *replace* at depth 1 (:509-530); white
    furnace miss = 1.0 (:512-515)
  - early-outs: no diffuse+specular, no direct+indirect, indirect-off past
    depth 1 (:153-158); per-lane enableDiffuse/enableSpecular gating (:191-195)
  - normal mapping with TBN re-orthogonalization row3 = N (:168-179)
  - metallic/roughness scaling + furnace forcing (:182-204)
  - Turquin multiscatter energy compensation (:206-218, :359-370) including the
    reference's use of dot(normalTS=(0,0,1), -rayDirWS) = -rayDir.z in the
    specular-sample DFG lookup (:361) — reproduced as-is for pixel parity
  - sun NEE with representative-point area-light approximation (:224-262);
    shadow ray along SunDirectionWS with t in [1e-5, FP32Max]
  - spot-light NEE loop with smoothstep angular attenuation and 4th-power
    distance falloff (:264-313); shadow ray offset by 0.01 * normal, t in
    [SpotShadowNearClip, dist - SpotShadowNearClip]
  - 50/50 lobe selection with sample-x remapping, cosine-hemisphere diffuse /
    GGX-VNDF specular with F * G2/G1 weight, x2 when both lobes (:315-376)
  - EnableDirect zeroing at depth 1 (:385-386)
  - terminal vertex: visibility ray along the BRDF direction; sky * visibility
    (or throughput replacement in furnace mode) (:411-438)
  - any-hit alpha test (opacity < 0.35 ignores the hit) only while depth <=
    MaxAnyHitPathLength, else FORCE_OPAQUE (:129-133, :485-507)
  - final clamp to [0, FP16Max] and progressive running-mean accumulation
    (:140-148)
"""

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..accel.traverse import any_hit, closest_hit
from ..app.settings import (AppSettings, SPOT_SHADOW_NEAR_CLIP)
from ..core import brdf as brdf_lib
from ..core import cmj
from ..core.constants import FP16Max, FP32Max
from ..core.math3 import dot, dot3, normalize, reflect, saturate, smoothstep
from ..scene.textures import sample_bilinear_wrap
from ..sky.cubemap import sample_cubemap


def _register(cls, meta=()):
    data = tuple(f.name for f in dataclasses.fields(cls) if f.name not in meta)
    jax.tree_util.register_dataclass(cls, data_fields=list(data), meta_fields=list(meta))
    return cls


@_register
@dataclasses.dataclass(frozen=True)
class FrameConstants:
    """Per-frame scalars — the RayTraceConstants cbuffer (RayTrace.hlsl:24-44).

    Passed as *traced* jit arguments so camera motion / progressive sample index
    never retrace; only settings changes do.
    """

    inv_view_projection: jax.Array   # (4, 4) f32, row-vector convention
    camera_pos_ws: jax.Array         # (3,)
    sun_direction_ws: jax.Array      # (3,)
    sun_irradiance: jax.Array        # (3,)
    sun_render_color: jax.Array      # (3,)
    cos_sun_angular_radius: jax.Array  # () f32
    sin_sun_angular_radius: jax.Array  # () f32
    curr_sample_idx: jax.Array       # () uint32


def _fetch_vertex_attrs(scene, tri_id, u, v):
    """GetHitSurface (RayTrace.hlsl:444-464): gather 3 vertices, barycentric
    lerp, normalize N/T/B."""
    tri = jnp.take(scene.tri_idx, jnp.maximum(tri_id, 0), axis=0)  # (N, 3)
    w = (1.0 - u - v)[..., None]
    uu = u[..., None]
    vv = v[..., None]

    def lerp3(arr):
        a0 = jnp.take(arr, tri[:, 0], axis=0)
        a1 = jnp.take(arr, tri[:, 1], axis=0)
        a2 = jnp.take(arr, tri[:, 2], axis=0)
        return a0 * w + a1 * uu + a2 * vv

    pos = lerp3(scene.positions)
    nrm = normalize(lerp3(scene.normals), eps=1e-37)
    uv = lerp3(scene.uvs)
    tan = normalize(lerp3(scene.tangents), eps=1e-37)
    bit = normalize(lerp3(scene.bitangents), eps=1e-37)
    return pos, nrm, uv, tan, bit


def _sample_material(scene, mat_idx, uv, slot):
    tex_idx = jnp.take(getattr(scene.materials, slot), mat_idx, axis=0)
    return sample_bilinear_wrap(scene.textures, tex_idx, uv)


def _make_alpha_test(scene, settings: AppSettings):
    """Alpha-test accept_fn for traversal, or None when the scene has no
    opacity-mapped materials (== every hit-group record is opaque,
    DXRPathTracer.cpp:1176-1199)."""
    if not scene.materials.any_opacity:
        return None

    def accept(tri_id, u, v):
        # Shape-polymorphic: called with (m,) rays or (m, L) leaf-slot blocks.
        mat = jnp.take(scene.tri_material, jnp.maximum(tri_id, 0), axis=0)
        has_op = jnp.take(scene.materials.has_opacity, mat, axis=0)
        tri = jnp.take(scene.tri_idx, jnp.maximum(tri_id, 0), axis=0)
        w = 1.0 - u - v
        uv0 = jnp.take(scene.uvs, tri[..., 0], axis=0)
        uv1 = jnp.take(scene.uvs, tri[..., 1], axis=0)
        uv2 = jnp.take(scene.uvs, tri[..., 2], axis=0)
        uv = uv0 * w[..., None] + uv1 * u[..., None] + uv2 * v[..., None]
        opacity = _sample_material(scene, mat, uv, "opacity")[..., 0]
        return jnp.where(has_op, opacity >= 0.35, True)

    return accept


def _to_tangent(v_ws, tan, bit, nrm):
    """Row-vector mul by transpose(tangentToWorld): project onto T/B/N."""
    return jnp.stack([dot(v_ws, tan), dot(v_ws, bit), dot(v_ws, nrm)], axis=-1)


def _from_tangent(v_ts, tan, bit, nrm):
    """Row-vector mul by tangentToWorld = rows (T, B, N)."""
    return (v_ts[..., 0:1] * tan + v_ts[..., 1:2] * bit + v_ts[..., 2:3] * nrm)


def trace_paths(scene, bvh, sky_cube, settings: AppSettings, frame: FrameConstants,
                ray_o, ray_d, t_max, pixel_idx, total_num_pixels: int,
                first_set_idx: int = 1, initial_is_diffuse: bool = False,
                t_min0=0.0, active0=None, sample_idx=None):
    """Trace a wavefront of rays to completion; returns (N, 3) radiance.

    ray_o/ray_d/t_max describe the depth-1 rays (already jittered primaries for
    the interactive path, or hemisphere rays for the baker). `first_set_idx` is
    the CMJ sample-set index consumed by the *first* PathTrace vertex (the
    raygen shader consumed set 0 for the pixel jitter). The baker sets
    initial_is_diffuse=True / t_min0=1e-4 (BakeRayGen, Baking.hlsl:395-409) and
    passes its own sample counter via `sample_idx`.
    """
    from ..core.sampling import sample_cosine_hemisphere, sample_ggx_visible_normal

    s = settings
    n = ray_o.shape[0]
    f32 = jnp.float32

    total = jnp.zeros((n, 3), f32)
    beta = jnp.ones((n, 3), f32)
    active = jnp.ones((n,), jnp.bool_) if active0 is None else active0
    prev_is_diffuse = jnp.full((n,), bool(initial_is_diffuse))
    prev_roughness = jnp.zeros((n,), f32)
    t_min = jnp.full((n,), t_min0, f32)
    cmj_sample_idx = frame.curr_sample_idx if sample_idx is None else sample_idx

    sqrt_n = int(s.sqrt_num_samples)
    furnace = bool(s.enable_white_furnace_mode)

    alpha_test = _make_alpha_test(scene, s)

    def sky_radiance(dirs):
        if furnace:
            return jnp.ones((dirs.shape[0], 3), f32)
        if not s.enable_sky or sky_cube is None:
            return jnp.zeros((dirs.shape[0], 3), f32)
        return sample_cubemap(sky_cube, dirs)

    # Depth loop: closest-hit vertices live at depths 1..MaxPathLength-1
    # (the reference only recurses while PathLength+1 < MaxPathLength).
    last_depth = max(int(s.max_path_length) - 1, 1)
    for depth in range(1, last_depth + 1):
        is_last = depth == last_depth
        use_any_hit = depth <= s.max_any_hit_path_length  # else FORCE_OPAQUE

        rec = closest_hit(bvh, ray_o, ray_d, t_min, t_max, active,
                          accept_fn=alpha_test if use_any_hit else None)
        hit = rec.hit & active
        missed = active & ~hit

        # ---- Miss shader (RayTrace.hlsl:509-530) ----
        if furnace:
            miss_rad = jnp.ones((n, 3), f32)
        else:
            miss_rad = sky_radiance(ray_d)
            if depth == 1:
                cos_sun = dot(ray_d, frame.sun_direction_ws[None, :])
                in_disc = cos_sun >= frame.cos_sun_angular_radius
                miss_rad = jnp.where(in_disc[..., None], frame.sun_render_color[None, :], miss_rad)
        total = total + jnp.where(missed[..., None], beta * miss_rad, 0.0)

        # ---- PathTrace early-outs (static) (RayTrace.hlsl:153-158) ----
        if ((not s.enable_diffuse and not s.enable_specular)
                or (not s.enable_direct and not s.enable_indirect)
                or (depth > 1 and not s.enable_indirect)):
            active = jnp.zeros_like(active)
            break

        # ---- Hit surface ----
        pos, geo_n, uv, tan, bit = _fetch_vertex_attrs(scene, rec.tri_id, rec.u, rec.v)
        mat = jnp.take(scene.tri_material, jnp.maximum(rec.tri_id, 0), axis=0)
        incoming_dir = ray_d
        incoming_origin = ray_o

        normal_ws = geo_n
        if s.enable_normal_maps:
            nm = _sample_material(scene, mat, uv, "normal")
            nx = nm[..., 0] * 2.0 - 1.0
            ny = nm[..., 1] * 2.0 - 1.0
            nz = jnp.sqrt(jnp.maximum(1.0 - saturate(nx * nx + ny * ny), 0.0))
            normal_ws = normalize(
                nx[..., None] * tan + ny[..., None] * bit + nz[..., None] * geo_n, eps=1e-37)
        # tangentToWorld._31_32_33 = normalWS (RayTrace.hlsl:178)
        frame_n = normal_ws

        if s.enable_albedo_maps and not furnace:
            base_color = _sample_material(scene, mat, uv, "albedo")[..., :3]
        else:
            base_color = jnp.ones((n, 3), f32)

        if furnace:
            metallic_raw = jnp.ones((n,), f32)
            sqrt_rough_raw = jnp.ones((n,), f32)
        else:
            metallic_raw = _sample_material(scene, mat, uv, "metallic")[..., 0]
            sqrt_rough_raw = _sample_material(scene, mat, uv, "roughness")[..., 0]
        metallic = saturate(metallic_raw * s.metallic_scale)
        sqrt_roughness = saturate(sqrt_rough_raw * s.roughness_scale)

        enable_diffuse_l = (s.enable_diffuse & (metallic < 1.0)) | furnace
        if s.enable_specular:
            if s.enable_indirect_specular:
                if s.avoid_caustic_paths:
                    enable_specular_l = ~prev_is_diffuse
                else:
                    enable_specular_l = jnp.ones((n,), jnp.bool_)
            else:
                enable_specular_l = jnp.full((n,), depth == 1)
        else:
            enable_specular_l = jnp.zeros((n,), jnp.bool_)

        lane_dead = ~(enable_diffuse_l | enable_specular_l)  # return 0 (hlsl:194-195)

        diffuse_albedo = ((1.0 - metallic)[..., None] * base_color
                          * enable_diffuse_l[..., None].astype(f32))
        specular_albedo = ((0.03 + (base_color - 0.03) * metallic[..., None])
                           * enable_specular_l[..., None].astype(f32))
        roughness = sqrt_roughness * sqrt_roughness
        if s.clamp_roughness:
            roughness = jnp.maximum(roughness, prev_roughness)

        ms_comp = jnp.ones((n, 3), f32)
        if s.apply_multiscattering_energy_compensation:
            n_dot_v = saturate(dot(normal_ws, -incoming_dir))
            ess, _ = brdf_lib.ggx_environment_brdf_scale_bias(n_dot_v, sqrt_roughness)
            ms_comp = 1.0 + specular_albedo * (1.0 / ess[..., None] - 1.0)

        if furnace:
            local = jnp.zeros((n, 3), f32)
        else:
            local = _sample_material(scene, mat, uv, "emissive")[..., :3]

        # ---- Sun NEE (RayTrace.hlsl:224-262) ----
        if s.enable_sun and not furnace:
            sun_d = frame.sun_direction_ws[None, :]
            if s.sun_area_light_approximation:
                r_vec = reflect(incoming_dir, normal_ws)
                d_dot_r = dot(sun_d, r_vec)
                s_vec = r_vec - d_dot_r[..., None] * sun_d
                closest = (frame.cos_sun_angular_radius * sun_d
                           + normalize(s_vec, eps=1e-37) * frame.sin_sun_angular_radius)
                shade_sun_dir = jnp.where(
                    (d_dot_r < frame.cos_sun_angular_radius)[..., None],
                    normalize(closest, eps=1e-37), r_vec)
            else:
                shade_sun_dir = jnp.broadcast_to(sun_d, (n, 3))
            sun_vis = any_hit(
                bvh, pos, jnp.broadcast_to(sun_d, (n, 3)),
                1e-5, FP32Max, hit,
                accept_fn=alpha_test if use_any_hit else None)
            sun_light = brdf_lib.calc_lighting(
                normal_ws, shade_sun_dir, frame.sun_irradiance[None, :],
                diffuse_albedo, specular_albedo, roughness, pos,
                incoming_origin, ms_comp)
            local = local + sun_light * sun_vis[..., None]

        # ---- Spot-light NEE (RayTrace.hlsl:264-313) ----
        num_lights = min(scene.lights.num_lights, int(s.max_light_clamp))
        if s.render_lights and num_lights > 0:
            for li in range(num_lights):
                lp = scene.lights.position[li][None, :]
                ld = scene.lights.direction[li][None, :]
                lint = scene.lights.intensity[li][None, :]
                ax = scene.lights.angular_attenuation_x[li]
                ay = scene.lights.angular_attenuation_y[li]
                lrange = scene.lights.range[li]

                to_light = lp - pos
                dist = jnp.sqrt(jnp.maximum(dot(to_light, to_light), 1e-20))
                to_light = to_light / dist[..., None]
                angle_f = saturate(dot(to_light, ld))
                ang_att = smoothstep(ay, ax, angle_f)
                dd = dist / lrange
                falloff = saturate(1.0 - dd ** 4)
                falloff = (falloff * falloff) / (dist * dist + 1.0)
                ang_att = ang_att * falloff
                relevant = hit & (ang_att > 0.0)

                vis = any_hit(
                    bvh, pos + normal_ws * 0.01, to_light,
                    SPOT_SHADOW_NEAR_CLIP,
                    jnp.maximum(dist - SPOT_SHADOW_NEAR_CLIP, SPOT_SHADOW_NEAR_CLIP),
                    relevant,
                    accept_fn=alpha_test if use_any_hit else None)
                light = brdf_lib.calc_lighting(
                    normal_ws, to_light, lint * ang_att[..., None],
                    diffuse_albedo, specular_albedo, roughness, pos,
                    incoming_origin, ms_comp)
                local = local + jnp.where(relevant[..., None], light * vis[..., None], 0.0)

        # ---- BRDF sampling (RayTrace.hlsl:315-376) ----
        set_idx = first_set_idx + (depth - 1)
        permutation = (jnp.uint32(set_idx) * jnp.uint32(total_num_pixels)
                       + pixel_idx.astype(jnp.uint32))
        uv2 = cmj.sample_cmj_2d(cmj_sample_idx, sqrt_n, sqrt_n, permutation)
        bx = uv2[..., 0]
        by = uv2[..., 1]

        selector = bx
        selector = jnp.where(enable_specular_l, selector, 0.0)
        selector = jnp.where(enable_diffuse_l, selector, 1.0)
        pick_diffuse = selector < 0.5

        # Diffuse branch
        bx_d = jnp.where(enable_specular_l, bx * 2.0, bx)
        dir_ts_diff = sample_cosine_hemisphere(bx_d, by)
        thr_diff = diffuse_albedo

        # Specular branch (GGX VNDF)
        bx_s = jnp.where(enable_diffuse_l, (bx - 0.5) * 2.0, bx)
        incoming_ts = normalize(_to_tangent(incoming_dir, tan, bit, frame_n), eps=1e-37)
        m_ts = sample_ggx_visible_normal(-incoming_ts, roughness, roughness, bx_s, by)
        dir_ts_spec = reflect(incoming_ts, m_ts)
        n_ts = jnp.zeros((n, 3), f32).at[:, 2].set(1.0)
        if furnace:
            fres = jnp.ones((n, 3), f32)
        else:
            fres = brdf_lib.fresnel(specular_albedo, m_ts, dir_ts_spec)
        a2 = roughness * roughness
        g1 = brdf_lib.smith_ggx_masking(n_ts, dir_ts_spec, -incoming_ts, a2)
        g2 = brdf_lib.smith_ggx_masking_shadowing(n_ts, dir_ts_spec, -incoming_ts, a2)
        thr_spec = fres * (g2 / jnp.where(g1 == 0.0, 1.0, g1))[..., None]
        if s.apply_multiscattering_energy_compensation:
            # Reference quirk (RayTrace.hlsl:361): dot(normalTS=(0,0,1),
            # -incomingRayDirWS) mixes spaces; equals -rayDir.z in world space.
            ndv_q = saturate(-incoming_dir[..., 2])
            ess_q, _ = brdf_lib.ggx_environment_brdf_scale_bias(ndv_q, sqrt_roughness)
            thr_spec = thr_spec * (1.0 + specular_albedo * (1.0 / ess_q[..., None] - 1.0))

        ray_dir_ts = jnp.where(pick_diffuse[..., None], dir_ts_diff, dir_ts_spec)
        throughput = jnp.where(pick_diffuse[..., None], thr_diff, thr_spec)
        ray_dir_ws = normalize(_from_tangent(ray_dir_ts, tan, bit, frame_n), eps=1e-37)
        throughput = jnp.where((enable_diffuse_l & enable_specular_l)[..., None],
                               throughput * 2.0, throughput)

        if depth == 1 and not s.enable_direct:
            local = jnp.zeros_like(local)

        continue_paths = s.enable_indirect and not is_last and not furnace
        if continue_paths:
            total = total + jnp.where(hit[..., None] & ~lane_dead[..., None],
                                      beta * local, 0.0)
            beta = beta * throughput
            active = hit & ~lane_dead
            prev_is_diffuse = pick_diffuse
            prev_roughness = roughness
            ray_o = pos
            ray_d = ray_dir_ws
            t_min = jnp.full((n,), 1e-5, f32)
            t_max = jnp.full((n,), FP32Max, f32)
        else:
            # Terminal vertex (RayTrace.hlsl:411-438)
            if furnace:
                local = throughput
            else:
                terminal_any_hit = (depth + 1) <= s.max_any_hit_path_length
                vis = any_hit(bvh, pos, ray_dir_ws, 1e-5, FP32Max, hit & ~lane_dead,
                              accept_fn=alpha_test if terminal_any_hit else None)
                sky_r = sky_radiance(ray_dir_ws) if s.enable_sky else jnp.zeros((n, 3), f32)
                local = local + vis[..., None] * sky_r * throughput
            total = total + jnp.where(hit[..., None] & ~lane_dead[..., None],
                                      beta * local, 0.0)
            active = jnp.zeros_like(active)
            break

    return jnp.clip(total, 0.0, FP16Max)


# Max rays per traversal tile. A frame's wavefront runs as a sequence of tiles
# via lax.map: bounds peak memory (leaf-gather temporaries are O(tile)),
# sidesteps TPU kernel faults observed on multi-hundred-k-lane integrator
# programs, and lets each tile's traversal while_loop exit as soon as *its*
# rays finish instead of waiting on the frame's single worst ray.
TILE_RAYS = 524288


def render_sample(scene, bvh, sky_cube, settings: AppSettings, frame: FrameConstants,
                  width: int, height: int, accum, row_offset=0, total_height=None):
    """One progressive sample: raygen + trace + running-mean accumulation
    (RaygenShader, RayTrace.hlsl:92-149). Returns the new accumulation image
    (height, width, 3) f32.

    For multi-chip row sharding (parallel/mesh.py), `height` is the local row
    count, `row_offset` the shard's first global row (traced OK), and
    `total_height` the full image height — pixel indices and NDC stay global so
    a sharded render matches single-chip to rounding (fusion-order ULPs).
    """
    s = settings
    f32 = jnp.float32
    th = total_height if total_height is not None else height
    n = width * th

    yy, xx = jnp.meshgrid(jnp.arange(height, dtype=f32), jnp.arange(width, dtype=f32),
                          indexing="ij")
    yy = yy + jnp.asarray(row_offset, f32)
    pixel_idx = (yy * width + xx).reshape(-1).astype(jnp.uint32)

    # set 0: pixel jitter
    jitter = cmj.sample_cmj_2d(frame.curr_sample_idx, int(s.sqrt_num_samples),
                               int(s.sqrt_num_samples), pixel_idx)
    px = xx.reshape(-1) + jitter[..., 0]
    py = yy.reshape(-1) + jitter[..., 1]

    ncd_x = px / (width * 0.5) - 1.0
    ncd_y = -(py / (th * 0.5) - 1.0)

    ivp = frame.inv_view_projection

    def unproject(z):
        # Explicit row-vector transform (x, y, z, 1) @ ivp. Written as mul/add
        # rather than a matmul: JAX's default matmul precision on TPU is
        # bfloat16, which catastrophically cancels the tiny far-plane w
        # (~0.01 from differences of ~100) to exactly 0 -> inf/NaN rays.
        out = (ncd_x[..., None] * ivp[0] + ncd_y[..., None] * ivp[1]
               + z * ivp[2] + ivp[3])
        return out[..., :3] / out[..., 3:4]

    ray_start = unproject(0.0)
    ray_end = unproject(1.0)
    seg = ray_end - ray_start
    ray_len = jnp.sqrt(jnp.maximum(dot(seg, seg), 1e-30))
    ray_dir = seg / ray_len[..., None]

    n_local = width * height
    n_tiles = max(1, -(-n_local // TILE_RAYS))
    while n_tiles > 1 and n_local % n_tiles != 0:
        n_tiles += 1  # image sizes are highly composite; terminates quickly
    if n_tiles > 1:
        tile = n_local // n_tiles

        def trace_tile(args):
            t_o, t_d, t_len, t_pix = args
            return trace_paths(scene, bvh, sky_cube, s, frame,
                               t_o, t_d, t_len, t_pix, n, first_set_idx=1)

        radiance = jax.lax.map(trace_tile, (
            ray_start.reshape(n_tiles, tile, 3),
            ray_dir.reshape(n_tiles, tile, 3),
            ray_len.reshape(n_tiles, tile),
            pixel_idx.reshape(n_tiles, tile),
        ))
    else:
        radiance = trace_paths(scene, bvh, sky_cube, s, frame,
                               ray_start, ray_dir, ray_len, pixel_idx, n,
                               first_set_idx=1)
    radiance = radiance.reshape(height, width, 3)

    lerp_factor = (frame.curr_sample_idx.astype(f32)
                   / (frame.curr_sample_idx.astype(f32) + 1.0))
    return radiance + (accum - radiance) * lerp_factor
