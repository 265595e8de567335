"""Forward "raster" renderer — the EnableRayTracing=false path.

Parity with MeshRenderer::RenderMainPass + Shading.hlsl's ShadePixel + the
skybox pass + weighted MSAA resolve (DXRPathTracer.cpp:1538-1843,
Shading.hlsl:79-240, Mesh.hlsl:107-170, Resolve.hlsl:33-65).

TPU-native structure: primary visibility is a ray cast through the same BVH
the path tracer uses (a rasterizer and a camera-ray cast produce identical
visibility; rays need no Z-buffer, no frustum culling, no draw-call loop).
Per MSAA subsample:
  - closest_hit -> surface attributes (the G-buffer interpolants of Mesh.hlsl)
  - ShadePixel semantics: normal mapping, diffuse/specular albedo gating,
    Turquin compensation, sun with the representative-point area-light
    direction and CSM-selected shadowing, clustered spot lights via the froxel
    mask (render/clusters.py), SH9 sky ambient * InvPi * 0.1, emissive, clamp
    to FP16Max
  - sun/spot visibility uses exact shadow rays instead of depth+PCF lookups
    (see render/shadows.py docstring)
  - EnableLightMapRender: albedo * baked-lightmap fetch (Mesh.hlsl:155-162)
  - misses render the sky cubemap (Skybox raster pass)
Subsamples combine with the firefly-resistant inverse-luminance weighted
resolve (Resolve.hlsl:33-65).
"""

import jax.numpy as jnp
import numpy as np

from ..accel.traverse import any_hit, closest_hit
from ..app.settings import (AppSettings, CLUSTER_TILE_SIZE, NUM_Z_TILES,
                            SPOT_SHADOW_NEAR_CLIP, MSAAModes)
from ..core import brdf as brdf_lib
from ..core.constants import FP16Max, FP32Max, InvPi
from ..core.math3 import dot, normalize, reflect, saturate, smoothstep
from ..render.integrator import FrameConstants, _fetch_vertex_attrs, \
    _make_alpha_test, _sample_material
from ..render.postfx import resolve_weighted
from ..scene.textures import sample_bilinear_wrap
from ..sky.cubemap import sample_cubemap

# Standard D3D MSAA sample offsets (in 1/16-pixel units)
MSAA_OFFSETS = {
    MSAAModes.MSAANone: [(0.0, 0.0)],
    MSAAModes.MSAA2x: [(4 / 16, 4 / 16), (-4 / 16, -4 / 16)],
    MSAAModes.MSAA4x: [(-2 / 16, -6 / 16), (6 / 16, -2 / 16),
                       (-6 / 16, 2 / 16), (2 / 16, 6 / 16)],
}


def shade_pixels(scene, bvh, rec, ray_o, ray_d, settings: AppSettings,
                 frame: FrameConstants, sky_sh, cluster_masks, cluster_dims,
                 pixel_xy, width, height, camera_forward, near_clip, far_clip,
                 lightmap=None, lightmap_uvs=None, sun_shadow_pcf=None,
                 spot_shadow_pcf=None):
    """ShadePixel (Shading.hlsl:79-240) over a flat batch of primary hits.

    sun_shadow_pcf: optional (depth_maps, cascades) pair switching sun
    visibility from exact rays to the reference's depth-map + 7x7 PCF path
    (SunShadowVisibility, Shadows.hlsl:318-360)."""
    s = settings
    n = ray_d.shape[0]
    f32 = jnp.float32
    hit = rec.hit

    pos, vtx_normal, uv, tan, bit = _fetch_vertex_attrs(scene, rec.tri_id, rec.u, rec.v)
    mat = jnp.take(scene.tri_material, jnp.maximum(rec.tri_id, 0), axis=0)
    view = normalize(frame.camera_pos_ws[None, :] - pos, eps=1e-37)

    normal = vtx_normal
    if s.enable_normal_maps:
        nm = _sample_material(scene, mat, uv, "normal")
        nx = nm[..., 0] * 2.0 - 1.0
        ny = nm[..., 1] * 2.0 - 1.0
        nz = jnp.sqrt(jnp.maximum(1.0 - saturate(nx * nx + ny * ny), 0.0))
        normal = normalize(nx[..., None] * tan + ny[..., None] * bit
                           + nz[..., None] * vtx_normal, eps=1e-37)

    albedo4 = _sample_material(scene, mat, uv, "albedo")
    albedo = albedo4[..., :3] if s.enable_albedo_maps else jnp.ones((n, 3), f32)

    # Lightmap-lit mode replaces shading entirely (Mesh.hlsl:155-162)
    if s.enable_light_map_render and lightmap is not None and lightmap_uvs is not None:
        luv = _interp_lightmap_uv(lightmap_uvs, rec)
        baked = _sample_lightmap(lightmap, luv)
        out = albedo * baked
        sky = _sky_or_black(scene, settings, frame, ray_d, None)
        return jnp.where(hit[..., None], out, sky)

    metallic = saturate(_sample_material(scene, mat, uv, "metallic")[..., 0])
    diffuse_albedo = ((1.0 - metallic)[..., None] * albedo
                      * (1.0 if s.enable_diffuse else 0.0))
    specular_albedo = ((0.03 + (albedo - 0.03) * metallic[..., None])
                       * (1.0 if s.enable_specular else 0.0))
    sqrt_roughness = _sample_material(scene, mat, uv, "roughness")[..., 0]
    roughness = sqrt_roughness * sqrt_roughness

    ms_comp = jnp.ones((n, 3), f32)
    if s.apply_multiscattering_energy_compensation:
        ndv = saturate(dot(normal, view))
        ess, _ = brdf_lib.ggx_environment_brdf_scale_bias(ndv, sqrt_roughness)
        ms_comp = 1.0 + specular_albedo * (1.0 / ess[..., None] - 1.0)

    alpha_test = _make_alpha_test(scene, s)
    output = jnp.zeros((n, 3), f32)

    # --- Sun (Shading.hlsl:143-175) ---
    if s.enable_sun and s.enable_direct:
        sun_d = frame.sun_direction_ws[None, :]
        if sun_shadow_pcf is not None:
            from .shadows import sun_visibility_moments, sun_visibility_pcf
            # (maps, cascades[, mode]) — mode selects the representation the
            # maps were converted to: 'pcf' raw depth (default), 'evsm' or
            # 'msm' moment maps (ShadowMapMode, ShadowHelper.h:25-108)
            depth_maps, cascades = sun_shadow_pcf[:2]
            sm_mode = sun_shadow_pcf[2] if len(sun_shadow_pcf) > 2 else "pcf"
            depth_vs_sun = dot(pos - frame.camera_pos_ws[None, :],
                               jnp.asarray(camera_forward, f32)[None, :])
            norm_depth = saturate((depth_vs_sun - near_clip)
                                  / (far_clip - near_clip))
            if sm_mode == "pcf":
                vis = sun_visibility_pcf(depth_maps, cascades, pos, normal,
                                         dot(normal, sun_d), norm_depth)
            else:
                vis = sun_visibility_moments(depth_maps, cascades, pos,
                                             normal, dot(normal, sun_d),
                                             norm_depth, sm_mode)
            vis = jnp.where(hit, vis, 0.0)
        else:
            vis = any_hit(bvh, pos, jnp.broadcast_to(sun_d, (n, 3)), 1e-3,
                          FP32Max, hit, accept_fn=alpha_test)
        if s.sun_area_light_approximation:
            r_vec = reflect(-view, normal)
            d_dot_r = dot(sun_d, r_vec)
            s_vec = r_vec - d_dot_r[..., None] * sun_d
            closest = (frame.cos_sun_angular_radius * sun_d
                       + normalize(s_vec, eps=1e-37) * frame.sin_sun_angular_radius)
            shade_dir = jnp.where((d_dot_r < frame.cos_sun_angular_radius)[..., None],
                                  normalize(closest, eps=1e-37), r_vec)
        else:
            shade_dir = jnp.broadcast_to(sun_d, (n, 3))
        sun_l = brdf_lib.calc_lighting(normal, shade_dir,
                                       frame.sun_irradiance[None, :],
                                       diffuse_albedo, specular_albedo, roughness,
                                       pos, frame.camera_pos_ws[None, :], ms_comp)
        output = output + sun_l * vis[..., None]

    # --- Clustered spot lights (Shading.hlsl:177-229) ---
    num_lights = min(scene.lights.num_lights, int(s.max_light_clamp))
    if s.render_lights and s.enable_direct and num_lights > 0:
        nx, ny, nz = cluster_dims
        depth_vs = dot(pos - frame.camera_pos_ws[None, :],
                       jnp.asarray(camera_forward, f32)[None, :])
        norm_z = saturate((depth_vs - near_clip) / (far_clip - near_clip))
        z_tile = jnp.minimum((norm_z * nz).astype(jnp.int32), nz - 1)
        tx = jnp.minimum(pixel_xy[:, 0] // CLUSTER_TILE_SIZE, nx - 1)
        ty = jnp.minimum(pixel_xy[:, 1] // CLUSTER_TILE_SIZE, ny - 1)
        # cluster index layout matches froxel_bounding_spheres (x-major grid)
        cluster = (tx * (ny * nz) + ty * nz + z_tile).astype(jnp.int32)
        mask = jnp.take(cluster_masks, cluster, axis=0)

        for li in range(num_lights):
            in_cluster = ((mask >> jnp.uint32(li)) & jnp.uint32(1)) != 0
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
            ang = smoothstep(ay, ax, angle_f)
            dd = dist / lrange
            falloff = saturate(1.0 - dd ** 4)
            falloff = (falloff * falloff) / (dist * dist + 1.0)
            relevant = hit & in_cluster & (ang > 0.0)
            if spot_shadow_pcf is not None:
                # per-spot 1024^2 depth map + the shared 7x7 PCF
                # (MeshRenderer.cpp:568-608); exact rays otherwise
                from .shadows import spot_visibility_pcf
                spot_maps, spot_cams = spot_shadow_pcf
                vis = spot_visibility_pcf(spot_maps, spot_cams, li, pos,
                                          normal, dot(normal, to_light))
            else:
                vis = any_hit(bvh, pos + normal * 0.01, to_light,
                              SPOT_SHADOW_NEAR_CLIP,
                              jnp.maximum(dist - SPOT_SHADOW_NEAR_CLIP,
                                          SPOT_SHADOW_NEAR_CLIP),
                              relevant, accept_fn=alpha_test)
            light = brdf_lib.calc_lighting(
                normal, to_light, lint * (ang * falloff)[..., None],
                diffuse_albedo, specular_albedo, roughness, pos,
                frame.camera_pos_ws[None, :], ms_comp)
            output = output + jnp.where(relevant[..., None],
                                        light * vis[..., None], 0.0)

    # --- SH sky ambient (Shading.hlsl:231-236) ---
    if s.enable_indirect and sky_sh is not None:
        ambient = _eval_sh9_irradiance(sky_sh, normal) * InvPi * 0.1
        output = output + ambient * diffuse_albedo

    output = output + _sample_material(scene, mat, uv, "emissive")[..., :3]
    output = jnp.clip(output, 0.0, FP16Max)

    sky = _sky_or_black(scene, settings, frame, ray_d, None)
    return jnp.where(hit[..., None], output, sky)


def _sky_or_black(scene, settings, frame, ray_d, sky_cube):
    # filled by forward_render's closure; standalone default is black
    return jnp.zeros((ray_d.shape[0], 3), jnp.float32)


_SH_A = np.array([np.pi, 2.0943951, 2.0943951, 2.0943951,
                  0.785398, 0.785398, 0.785398, 0.785398, 0.785398], np.float32)


def _eval_sh9_irradiance(sh, normal):
    """EvalSH9Irradiance (Shaders/SH.hlsl:437-486) on (N, 3) normals."""
    x, y, z = normal[..., 0], normal[..., 1], normal[..., 2]
    basis = jnp.stack([
        jnp.full_like(x, 0.282095),
        0.488603 * y, 0.488603 * z, 0.488603 * x,
        1.092548 * x * y, 1.092548 * y * z,
        0.315392 * (3.0 * z * z - 1.0),
        1.092548 * x * z, 0.546274 * (x * x - y * y),
    ], axis=-1)  # (N, 9)
    return jnp.einsum("nk,kc,k->nc", basis, sh, jnp.asarray(_SH_A))


def _interp_lightmap_uv(lightmap_uvs, rec):
    """Per-corner lightmap UVs (T, 3, 2) -> interpolated (N, 2)."""
    tri_uv = jnp.take(lightmap_uvs, jnp.maximum(rec.tri_id, 0), axis=0)
    w = (1.0 - rec.u - rec.v)[..., None]
    return (tri_uv[:, 0] * w + tri_uv[:, 1] * rec.u[..., None]
            + tri_uv[:, 2] * rec.v[..., None])


def _sample_lightmap(lightmap, uv):
    """Bilinear clamp fetch from an (S, S, 3) lightmap."""
    s = lightmap.shape[0]
    x = uv[..., 0] * s - 0.5
    y = uv[..., 1] * s - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]

    def cl(i):
        return jnp.clip(i.astype(jnp.int32), 0, s - 1)

    flat = lightmap.reshape(-1, 3)

    def fetch(yi, xi):
        return jnp.take(flat, yi * s + xi, axis=0)

    t00 = fetch(cl(y0), cl(x0))
    t10 = fetch(cl(y0), cl(x0 + 1))
    t01 = fetch(cl(y0 + 1), cl(x0))
    t11 = fetch(cl(y0 + 1), cl(x0 + 1))
    top = t00 + (t10 - t00) * fx
    bot = t01 + (t11 - t01) * fx
    return top + (bot - top) * fy


def forward_render(scene, bvh, sky_cube, sky_sh, settings: AppSettings,
                   frame: FrameConstants, width: int, height: int,
                   cluster_masks, cluster_dims, camera_forward,
                   near_clip: float, far_clip: float,
                   lightmap=None, lightmap_uvs=None, sun_shadow_pcf=None,
                 spot_shadow_pcf=None):
    """Full raster-mode frame: MSAA subsample shading + weighted resolve.

    Returns (H, W, 3) radiance (pre-tonemap, FP16Scale units).
    """
    s = settings
    f32 = jnp.float32
    n = width * height
    offsets = MSAA_OFFSETS[s.msaa_mode]

    yy, xx = jnp.meshgrid(jnp.arange(height, dtype=f32),
                          jnp.arange(width, dtype=f32), indexing="ij")
    pixel_xy = jnp.stack([xx.reshape(-1), yy.reshape(-1)], -1).astype(jnp.int32)

    ivp = frame.inv_view_projection
    alpha_test = _make_alpha_test(scene, s)
    samples = []
    for ox, oy in offsets:
        px = xx.reshape(-1) + 0.5 + ox
        py = yy.reshape(-1) + 0.5 + oy
        ncd_x = px / (width * 0.5) - 1.0
        ncd_y = -(py / (height * 0.5) - 1.0)

        def unproject(z):
            out = (ncd_x[..., None] * ivp[0] + ncd_y[..., None] * ivp[1]
                   + z * ivp[2] + ivp[3])
            return out[..., :3] / out[..., 3:4]

        ray_start = unproject(0.0)
        seg = unproject(1.0) - ray_start
        ray_len = jnp.sqrt(jnp.maximum(dot(seg, seg), 1e-30))
        ray_dir = seg / ray_len[..., None]

        rec = closest_hit(bvh, ray_start, ray_dir, 0.0, ray_len,
                          accept_fn=alpha_test)
        shaded = shade_pixels(scene, bvh, rec, ray_start, ray_dir, s, frame,
                              sky_sh, cluster_masks, cluster_dims, pixel_xy,
                              width, height, camera_forward, near_clip, far_clip,
                              lightmap=lightmap, lightmap_uvs=lightmap_uvs,
                              sun_shadow_pcf=sun_shadow_pcf,
                              spot_shadow_pcf=spot_shadow_pcf)
        # Sky for misses (skybox.RenderSky, DXRPathTracer.cpp:1791)
        if s.enable_sky and sky_cube is not None:
            sky = sample_cubemap(sky_cube, ray_dir)
            shaded = jnp.where(rec.hit[..., None], shaded, sky)
        samples.append(shaded)

    stack = jnp.stack(samples)  # (S, N, 3)
    resolved = resolve_weighted(stack, float(s.exposure))
    return resolved.reshape(height, width, 3)
