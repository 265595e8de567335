"""Cascaded shadow-map math — the ShadowHelper equivalent.

Parity with ShadowHelper::PrepareCascades (Graphics/ShadowHelper.h:25-108 /
ShadowHelper.cpp): 4 stabilized cascades over the camera frustum, each an
orthographic light-space projection whose bounding sphere is texel-snapped so
cascade edges don't shimmer under camera motion.

Two sun-visibility backends exist for the raster path:
  - exact shadow RAYS through the path tracer's BVH (default; strictly higher
    quality than depth+PCF, no resolution/peter-panning artifacts), and
  - depth maps + PCF matching the reference's shipped configuration
    (ShadowMapMode::DepthMap, DXRPathTracer.cpp:267): per-cascade depth
    rendered by an ortho ray cast from the light
    (`render_cascade_depth_maps` = the DepthOnly.hlsl pass), sampled with the
    7x7 disc-weighted PCF kernel of SampleShadowMapGatherPCF
    (Shadows.hlsl:165-286 — the GatherCmp code is an optimized evaluation of
    exactly this bilinear-weighted comparison filter) plus the normal-offset
    bias of GetShadowPosOffset (Shadows.hlsl:307-314).
"""

import dataclasses

import numpy as np

NUM_CASCADES = 4
SHADOW_MAP_SIZE = 2048  # sun CSM resolution (MeshRenderer.cpp sun shadow map)
SPOT_SHADOW_MAP_SIZE = 1024


@dataclasses.dataclass(frozen=True)
class Cascade:
    split_depth: float       # far split, view-space [0..1] of (near..far)
    view_proj: np.ndarray    # (4, 4) row-vector light-space ortho transform
    center: np.ndarray       # (3,) world-space bounding-sphere center
    radius: float


def cascade_splits(num=NUM_CASCADES, lambda_log=0.75):
    """Practical split scheme: log/uniform blend (standard CSM practice)."""
    splits = []
    for i in range(1, num + 1):
        p = i / num
        log_s = 0.01 * (1.0 / 0.01) ** p
        uni_s = p
        splits.append(lambda_log * log_s + (1 - lambda_log) * uni_s)
    return np.asarray(splits, np.float32)


def _look_at_lh(eye, target, up):
    f = target - eye
    f = f / np.linalg.norm(f)
    r = np.cross(up, f)
    r = r / np.linalg.norm(r)
    u = np.cross(f, r)
    m = np.eye(4, dtype=np.float64)
    m[0, :3] = r
    m[1, :3] = u
    m[2, :3] = f
    view = np.eye(4, dtype=np.float64)
    view[:3, :3] = m[:3, :3].T
    view[3, :3] = -(eye @ m[:3, :3].T)
    return view


def prepare_cascades(camera, sun_direction, num=NUM_CASCADES,
                     map_size=SHADOW_MAP_SIZE):
    """Stabilized cascades for the current camera (PrepareCascades parity).

    Returns list[Cascade]. Frustum-slice corners -> bounding sphere ->
    texel-snapped light-space ortho box.
    """
    sun_direction = np.asarray(sun_direction, np.float64)
    sun_direction = sun_direction / np.linalg.norm(sun_direction)
    near, far = camera.near_clip, camera.far_clip
    splits = cascade_splits(num)

    inv_vp = np.linalg.inv(camera.view_projection().astype(np.float64))

    def frustum_corners(z0n, z1n):
        """8 world-space corners of the [z0n, z1n] normalized depth slice."""
        pts = []
        for zn in (z0n, z1n):
            # Convert normalized view depth to NDC z through the projection:
            zv = near + (far - near) * zn
            h = np.array([[x, y, 0.0, 1.0] for x in (-1, 1) for y in (-1, 1)])
            # project a view-space depth to NDC z: z_ndc = (zv*rng - rng*nz)/zv
            rng = far / (far - near)
            z_ndc = (zv * rng - rng * near) / zv
            h[:, 2] = z_ndc
            w = h @ inv_vp
            pts.append(w[:, :3] / w[:, 3:4])
        return np.concatenate(pts)

    cascades = []
    prev = 0.0
    for i in range(num):
        corners = frustum_corners(prev, float(splits[i]))
        center = corners.mean(axis=0)
        radius = float(np.linalg.norm(corners - center, axis=1).max())
        # Stabilization: snap the sphere center to shadow-texel increments in
        # light space (ShadowHelper's stabilized mode).
        up = np.array([0.0, 1.0, 0.0]) if abs(sun_direction[1]) < 0.99 else np.array([0.0, 0.0, 1.0])
        # Light eye on the SUN side of the slice, looking down-sun (the
        # shadow-caster view DepthOnly.hlsl renders from).
        light_view = _look_at_lh(center + sun_direction * radius * 2.0, center, up)
        texel = (2.0 * radius) / map_size
        c_ls = np.append(center, 1.0) @ light_view
        c_ls[:2] = np.floor(c_ls[:2] / texel) * texel
        center_snapped = (np.append(c_ls[:3], 1.0) @ np.linalg.inv(light_view))[:3]
        light_view = _look_at_lh(center_snapped + sun_direction * radius * 2.0,
                                 center_snapped, up)
        # Ortho projection over the sphere extents
        ortho = np.zeros((4, 4))
        ortho[0, 0] = 1.0 / radius
        ortho[1, 1] = 1.0 / radius
        ortho[2, 2] = 1.0 / (4.0 * radius)
        ortho[3, 2] = 0.0
        ortho[3, 3] = 1.0
        cascades.append(Cascade(
            split_depth=float(splits[i]),
            view_proj=(light_view @ ortho).astype(np.float32),
            center=center_snapped.astype(np.float32),
            radius=radius))
        prev = float(splits[i])
    return cascades


def select_cascade(depth_vs_normalized, splits):
    """Cascade index per pixel from normalized view depth (vectorizable)."""
    import jax.numpy as jnp
    idx = jnp.zeros_like(depth_vs_normalized, dtype=jnp.int32)
    for i in range(len(splits) - 1):
        idx = jnp.where(depth_vs_normalized > splits[i], i + 1, idx)
    return idx


# ---------------------------------------------------------------------------
# Depth-map + PCF backend (reference's shipped ShadowMapMode::DepthMap)

# 7x7 disc kernel of SampleShadowMapGatherPCF (Shadows.hlsl:165-173).
PCF_W = np.array([
    [0.0, 0.0, 0.5, 1.0, 0.5, 0.0, 0.0],
    [0.0, 1.0, 1.0, 1.0, 1.0, 1.0, 0.0],
    [0.5, 1.0, 1.0, 1.0, 1.0, 1.0, 0.5],
    [1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0],
    [0.5, 1.0, 1.0, 1.0, 1.0, 1.0, 0.5],
    [0.0, 1.0, 1.0, 1.0, 1.0, 1.0, 0.0],
    [0.0, 0.0, 0.5, 1.0, 0.5, 0.0, 0.0]], np.float32)
PCF_BIAS = 0.001  # lightDepth = shadowPos.z - 0.001 (Shadows.hlsl:185)


def render_cascade_depth_maps(bvh, cascades, map_size: int = 512,
                              accept_fn=None):
    """Ortho ray-cast depth from the light per cascade — the TPU DepthOnly
    pass (MeshRenderer::RenderSunShadowMap, MeshRenderer.cpp:534-565).

    `accept_fn` is the scene's alpha-test hook (integrator._make_alpha_test):
    the reference's DepthOnly pass uses the alpha-tested PSO variant for
    opacity-mapped meshes, so depth rays must skip rejected texels too —
    otherwise PCF shadows diverge from the exact-ray backend (ADVICE.md).

    Returns (num_cascades, S, S) float32 light-space depth in [0, 1]
    (1 where nothing was hit). Texel (i, j) covers light-clip
    x = (j+0.5)/S*2-1, y = (i+0.5)/S*2-1; `sun_visibility_pcf` samples with
    the same convention so no flip is needed.
    """
    import jax.numpy as jnp
    from ..accel.traverse import closest_hit

    s = map_size
    maps = []
    for c in cascades:
        inv_vp = np.linalg.inv(c.view_proj.astype(np.float64))
        jj, ii = np.meshgrid(np.arange(s), np.arange(s), indexing="xy")
        x = (jj.reshape(-1) + 0.5) / s * 2.0 - 1.0
        y = (ii.reshape(-1) + 0.5) / s * 2.0 - 1.0
        h0 = np.stack([x, y, np.zeros_like(x), np.ones_like(x)], -1) @ inv_vp
        h1 = np.stack([x, y, np.ones_like(x), np.ones_like(x)], -1) @ inv_vp
        o = (h0[:, :3] / h0[:, 3:4]).astype(np.float32)
        e = (h1[:, :3] / h1[:, 3:4]).astype(np.float32)
        seg = e - o
        ray_len = np.linalg.norm(seg, axis=-1)
        d = (seg / ray_len[:, None]).astype(np.float32)
        rec = closest_hit(bvh, jnp.asarray(o), jnp.asarray(d),
                          0.0, jnp.asarray(ray_len.astype(np.float32)),
                          accept_fn=accept_fn)
        depth = rec.t / jnp.asarray(ray_len.astype(np.float32))
        maps.append(depth.reshape(s, s))
    return jnp.stack(maps)


def sun_visibility_pcf(depth_maps, cascades, pos_ws, normal_ws, n_dot_l,
                       depth_vs_normalized):
    """SunShadowVisibility with the 7x7 weighted PCF (Shadows.hlsl:318-360).

    depth_maps: (C, S, S) from render_cascade_depth_maps; cascades: the
    matching list[Cascade]; pos_ws/normal_ws: (N, 3); n_dot_l: (N,);
    depth_vs_normalized: (N,) view depth in [0, 1] for cascade selection.
    Returns (N,) visibility in [0, 1].
    """
    import jax.numpy as jnp

    n_casc, s, _ = depth_maps.shape
    splits = np.array([c.split_depth for c in cascades], np.float32)
    vps = jnp.asarray(np.stack([c.view_proj for c in cascades]))   # (C, 4, 4)
    radii = jnp.asarray(np.array([c.radius for c in cascades], np.float32))

    cidx = select_cascade(depth_vs_normalized, splits)             # (N,)
    vp = jnp.take(vps, cidx, axis=0)                               # (N, 4, 4)
    radius = jnp.take(radii, cidx, axis=0)                         # (N,)

    # GetShadowPosOffset (Shadows.hlsl:307-314): 4 shadow texels along the
    # normal, faded in as nDotL falls off; texel world size = 2r/S.
    offset = (normal_ws * ((1.0 - jnp.clip(n_dot_l, 0.0, 1.0))
                           * 4.0 * (2.0 * radius / s))[..., None])
    p = pos_ws + offset
    # Row-vector projection, explicit mul/add (matmul would run bf16 on TPU).
    hx = (p[:, 0] * vp[:, 0, 0] + p[:, 1] * vp[:, 1, 0]
          + p[:, 2] * vp[:, 2, 0] + vp[:, 3, 0])
    hy = (p[:, 0] * vp[:, 0, 1] + p[:, 1] * vp[:, 1, 1]
          + p[:, 2] * vp[:, 2, 1] + vp[:, 3, 1])
    hz = (p[:, 0] * vp[:, 0, 2] + p[:, 1] * vp[:, 1, 2]
          + p[:, 2] * vp[:, 2, 2] + vp[:, 3, 2])
    light_depth = hz - PCF_BIAS
    return _pcf_filter(depth_maps.reshape(-1), cidx * (s * s), s,
                       hx, hy, light_depth)


def _pcf_filter(flat, base, s, hx, hy, light_depth):
    """The 7x7 disc-weighted PCF comparison filter shared by the sun CSM and
    spot shadow paths (SampleShadowMapGatherPCF, Shadows.hlsl:165-286: the
    GatherCmp code is an optimized evaluation of exactly this bilinear-
    weighted comparison). flat: flattened depth maps; base: per-lane flat
    offset of the selected map; hx/hy: NDC in [-1, 1]."""
    import jax.numpy as jnp

    # Fractional texel position (stc/tcs/fc of SampleShadowMapGatherPCF).
    stc_x = (hx * 0.5 + 0.5) * s  # texel-edge coords; texel j covers [j, j+1)
    stc_y = (hy * 0.5 + 0.5) * s
    base_x = jnp.floor(stc_x - 0.5)
    base_y = jnp.floor(stc_y - 0.5)
    fx = stc_x - 0.5 - base_x
    fy = stc_y - 0.5 - base_y
    bx = base_x.astype(jnp.int32)
    by = base_y.astype(jnp.int32)

    # 8x8 comparison grid around the footprint; weights = the 7x7 disc kernel
    # convolved with the per-lane bilinear foot (the exact filter the Gruen
    # GatherCmp code evaluates).
    vis = jnp.zeros_like(fx)
    for gy in range(8):
        ty = jnp.clip(by + (gy - 3), 0, s - 1)
        for gx in range(8):
            # Grid texel (gy, gx) collects the bilinear feet of the (up to 4)
            # kernel taps that cover it: tap k spans texels k and k+1 with
            # weights (1-f) and f.
            w = None
            for ky, wyf in ((gy - 1, fy), (gy, 1.0 - fy)):
                if not 0 <= ky <= 6:
                    continue
                for kx, wxf in ((gx - 1, fx), (gx, 1.0 - fx)):
                    if not 0 <= kx <= 6 or PCF_W[ky, kx] == 0.0:
                        continue
                    term = PCF_W[ky, kx] * wyf * wxf
                    w = term if w is None else w + term
            if w is None:
                continue  # corner texels outside every tap's foot
            tx = jnp.clip(bx + (gx - 3), 0, s - 1)
            d = jnp.take(flat, base + ty * s + tx, axis=0)
            vis = vis + w * (light_depth <= d).astype(jnp.float32)
    return vis / PCF_W.sum()


# ---------------------------------------------------------------------------
# Spot-light shadow maps (RenderSpotLightShadowMap, MeshRenderer.cpp:568-608:
# one 1024^2 perspective depth map per spot, DepthOnly pass + the same PCF).

@dataclasses.dataclass(frozen=True)
class SpotShadow:
    view_proj: np.ndarray   # (4, 4) row-vector LH perspective transform
    position: np.ndarray    # (3,) light position
    forward: np.ndarray     # (3,) light direction (normalized)
    near: float
    far: float


def prepare_spot_shadows(lights, near_clip: float, light_range=None):
    """One perspective shadow camera per spot light (MeshRenderer.cpp:
    568-585: PerspectiveCamera with fov = the cone's outer angle, near =
    SpotShadowNearClip, far = SpotLightRange)."""
    from .camera import perspective_fov_lh

    out = []
    n = int(lights.num_lights)
    for li in range(n):
        lp = np.asarray(lights.position[li], np.float64)
        ld = np.asarray(lights.direction[li], np.float64)
        ld = ld / max(np.linalg.norm(ld), 1e-20)
        cos_outer = float(np.asarray(lights.angular_attenuation_y[li]))
        far = float(np.asarray(lights.range[li])) if light_range is None \
            else float(light_range)
        fov = 2.0 * float(np.arccos(np.clip(cos_outer, -1.0, 1.0)))
        fov = min(max(fov * 1.02, 0.05), np.pi * 0.98)  # filter margin
        up = (np.array([0.0, 0.0, 1.0]) if abs(ld[1]) > 0.9
              else np.array([0.0, 1.0, 0.0]))
        view = _look_at_lh(lp, lp + ld, up)
        proj = perspective_fov_lh(fov, 1.0, near_clip, far).astype(np.float64)
        out.append(SpotShadow(
            view_proj=(view @ proj).astype(np.float32),
            position=lp.astype(np.float32), forward=ld.astype(np.float32),
            near=near_clip, far=far))
    return out


def render_spot_depth_maps(bvh, spots, map_size: int = SPOT_SHADOW_MAP_SIZE,
                           accept_fn=None):
    """Per-spot perspective ray-cast depth (the DepthOnly pass from the
    light's point of view). Returns (L, S, S) f32 LINEAR depth fraction
    (zview - near) / (far - near) in [0, 1], 1 where nothing was hit —
    linear depth avoids the z/w precision cliff and compares exactly against
    the fraction computed at shading time."""
    import jax.numpy as jnp

    from ..accel.traverse import closest_hit

    s = map_size
    maps = []
    for sp in spots:
        inv_vp = np.linalg.inv(sp.view_proj.astype(np.float64))
        jj, ii = np.meshgrid(np.arange(s), np.arange(s), indexing="xy")
        x = (jj.reshape(-1) + 0.5) / s * 2.0 - 1.0
        y = (ii.reshape(-1) + 0.5) / s * 2.0 - 1.0
        h1 = np.stack([x, y, np.ones_like(x), np.ones_like(x)], -1) @ inv_vp
        far_pt = h1[:, :3] / h1[:, 3:4]
        o = np.broadcast_to(sp.position.astype(np.float64), far_pt.shape)
        seg = far_pt - o
        ray_len = np.linalg.norm(seg, axis=-1)
        d = (seg / ray_len[:, None]).astype(np.float32)
        rec = closest_hit(bvh, jnp.asarray(o.astype(np.float32)),
                          jnp.asarray(d), 0.0,
                          jnp.asarray(ray_len.astype(np.float32)),
                          accept_fn=accept_fn)
        cos_f = jnp.asarray((d @ sp.forward).astype(np.float32))
        zview = rec.t * cos_f
        frac = (zview - sp.near) / (sp.far - sp.near)
        frac = jnp.where(rec.tri_id >= 0, jnp.clip(frac, 0.0, 1.0), 1.0)
        maps.append(frac.reshape(s, s))
    return jnp.stack(maps) if maps else jnp.zeros((0, s, s), jnp.float32)


def spot_visibility_pcf(depth_maps, spots, light_idx: int, pos_ws, normal_ws,
                        n_dot_l):
    """Spot-light shadow visibility with the shared 7x7 PCF
    (Shadows.hlsl spot path + MeshRenderer.cpp:568-608 intent)."""
    import jax.numpy as jnp

    sp = spots[light_idx]
    _l, s, _ = depth_maps.shape
    vp = jnp.asarray(sp.view_proj)

    # normal-offset bias scaled by the local texel footprint (perspective:
    # texel world size grows linearly with view depth)
    zview = ((pos_ws - jnp.asarray(sp.position)[None, :])
             @ jnp.asarray(sp.forward))
    texel_ws = 2.0 * zview / s  # ~frustum width at depth / map size
    offset = (normal_ws * ((1.0 - jnp.clip(n_dot_l, 0.0, 1.0))
                           * 4.0 * texel_ws)[..., None])
    p = pos_ws + offset
    hx = (p[:, 0] * vp[0, 0] + p[:, 1] * vp[1, 0]
          + p[:, 2] * vp[2, 0] + vp[3, 0])
    hy = (p[:, 0] * vp[0, 1] + p[:, 1] * vp[1, 1]
          + p[:, 2] * vp[2, 1] + vp[3, 1])
    hw = (p[:, 0] * vp[0, 3] + p[:, 1] * vp[1, 3]
          + p[:, 2] * vp[2, 3] + vp[3, 3])
    safe_w = jnp.where(jnp.abs(hw) < 1e-8, 1e-8, hw)
    ndc_x = hx / safe_w
    ndc_y = hy / safe_w
    zo = ((p - jnp.asarray(sp.position)[None, :]) @ jnp.asarray(sp.forward))
    light_depth = (zo - sp.near) / (sp.far - sp.near) - PCF_BIAS

    flat = depth_maps.reshape(-1)
    base = jnp.full(pos_ws.shape[:1], light_idx * (s * s), jnp.int32)
    vis = _pcf_filter(flat, base, s, ndc_x, ndc_y, light_depth)
    # outside the shadow frustum -> lit (matches the cone attenuation
    # already zeroing contributions outside the outer angle)
    inside = ((jnp.abs(ndc_x) <= 1.0) & (jnp.abs(ndc_y) <= 1.0)
              & (hw > 0.0) & (light_depth <= 1.0))
    return jnp.where(inside, vis, 1.0)
