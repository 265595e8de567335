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


# ---------------------------------------------------------------------------
# EVSM / MSM moment shadow maps (ShadowMapMode::EVSM / ::MSM).
#
# The reference framework ships three shadow-map representations selected by
# ShadowHelper::Initialize (Graphics/ShadowHelper.h:25-108): plain depth+PCF
# (what the app uses, DXRPathTracer.cpp:267), EVSM (exponential variance,
# Shaders/EVSM.hlsl) and MSM (4-moment, Shaders/MSM.hlsl). SMConvert.hlsl
# turns a rendered depth map into the moment representation and FilterSM
# box-blurs it separably; sampling is then a single filtered texture fetch +
# a closed-form upper bound (Chebyshev for EVSM, Hamburger 4-moment for MSM)
# instead of a multi-tap comparison. The TPU build mirrors that exactly:
# convert_depth_maps (SMConvert), filter_moment_maps (FilterSM), and
# sun_visibility_moments (SampleShadowMapEVSM/MSM, Shadows.hlsl:88-160).

# ShadowHelper defaults: LightBleedingReduction 0.25 (ShadowHelper.h:40,48),
# MomentBias 0.0003 (ShadowHelper.h:47). The app never initializes the EVSM
# exponents (it runs DepthMap mode); 40/8 are MJP's standard shadow-sample
# values, clamped to 42 like GetEVSMExponents (EVSM.hlsl).
EVSM_POSITIVE_EXPONENT = 40.0
EVSM_NEGATIVE_EXPONENT = 8.0
EVSM_MAX_EXPONENT = 42.0
LIGHT_BLEEDING_REDUCTION = 0.25
MSM_DEPTH_BIAS = 0.0
MSM_MOMENT_BIAS = 0.0003

# GetOptimizedMoments / ConvertOptimizedMoments quantization transform
# (MSM.hlsl — the published Peters & Klein optimized-moment basis).
_MSM_ENCODE = np.array(
    [[-2.07224649,    13.7948857237,  0.105877704,   9.7924062118],
     [32.23703778,   -59.4683975703, -1.9077466311, -33.7652110555],
     [-68.571074599,  82.0359750338,  9.3496555107,  47.9456096605],
     [39.3703274134, -35.364903257,  -6.6543490743, -23.9728048165]],
    np.float32)
_MSM_DECODE = np.array(
    [[0.2227744146, 0.1549679261, 0.1451988946, 0.163127443],
     [0.0771972861, 0.1394629426, 0.2120202157, 0.2591432266],
     [0.7926986636, 0.7963415838, 0.7258694464, 0.6539092497],
     [0.0319417555, -0.1722823173, -0.2758014811, -0.3376131734]],
    np.float32)
_MSM_BIAS0 = 0.035955884801


def evsm_exponents(cascade_scale_z=1.0):
    """GetEVSMExponents (EVSM.hlsl): light-space exponents kept consistent
    across partitions, clamped so exp() stays inside fp32."""
    pos = min(EVSM_POSITIVE_EXPONENT / cascade_scale_z, EVSM_MAX_EXPONENT)
    neg = min(EVSM_NEGATIVE_EXPONENT / cascade_scale_z, EVSM_MAX_EXPONENT)
    return pos, neg


def warp_depth(depth, exponents):
    """WarpDepth (EVSM.hlsl): [0,1] depth -> (exp(+px*d'), -exp(-nx*d'))
    with d' rescaled to [-1,1]."""
    import jax.numpy as jnp
    d = 2.0 * depth - 1.0
    return jnp.exp(exponents[0] * d), -jnp.exp(-exponents[1] * d)


def convert_depth_maps(depth_maps, mode: str):
    """SMConvert.hlsl: (C, S, S) [0,1] depth -> (C, S, S, 4) moments.

    mode 'evsm': [pos, neg, pos^2, neg^2] warped-depth moments.
    mode 'msm':  optimized 4-moment encoding (GetOptimizedMoments)."""
    import jax.numpy as jnp
    d = jnp.asarray(depth_maps)
    if mode == "evsm":
        pos, neg = warp_depth(d, evsm_exponents())
        return jnp.stack([pos, neg, pos * pos, neg * neg], axis=-1)
    if mode == "msm":
        sq = d * d
        raw = jnp.stack([d, sq, sq * d, sq * sq], axis=-1)
        opt = raw @ jnp.asarray(_MSM_ENCODE)
        return opt.at[..., 0].add(_MSM_BIAS0)
    raise ValueError(f"unknown moment mode {mode!r}")


def filter_moment_maps(maps, filter_size: float = 3.0):
    """FilterSM (SMConvert.hlsl): separable box blur of the moment maps,
    fractional end-texel weights, clamped edges. filter_size is in texels
    (MaxShadowFilterSize = 9, ShadowHelper.h:26)."""
    import jax.numpy as jnp

    radius = filter_size * 0.5
    ntap = int(np.ceil(radius - 0.5))

    def blur(m, axis):
        s = m.shape[axis]
        total = m * 1.0
        weight = 1.0
        for k in range(1, ntap + 1):
            # overlap of texel [k-0.5, k+0.5] with the filter [-R, R]
            w = float(np.clip(radius - (k - 0.5), 0.0, 1.0))
            if w <= 0.0:
                continue
            idx_p = jnp.clip(jnp.arange(s) + k, 0, s - 1)
            idx_m = jnp.clip(jnp.arange(s) - k, 0, s - 1)
            total = total + w * (jnp.take(m, idx_p, axis=axis)
                                 + jnp.take(m, idx_m, axis=axis))
            weight += 2.0 * w
        return total / weight

    return blur(blur(jnp.asarray(maps), 1), 2)


def _bilinear_fetch4(maps, cidx, hx, hy):
    """Bilinearly sample (C, S, S, 4) moment maps at NDC (hx, hy) of the
    per-lane selected map cidx — the SampleShadowMapEVSM/MSM linear fetch."""
    import jax.numpy as jnp

    c, s, _, _ = maps.shape
    flat = maps.reshape(-1, 4)
    base = cidx * (s * s)
    stx = (hx * 0.5 + 0.5) * s - 0.5
    sty = (hy * 0.5 + 0.5) * s - 0.5
    x0 = jnp.clip(jnp.floor(stx), 0, s - 1)
    y0 = jnp.clip(jnp.floor(sty), 0, s - 1)
    fx = jnp.clip(stx - x0, 0.0, 1.0)[..., None]
    fy = jnp.clip(sty - y0, 0.0, 1.0)[..., None]
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, s - 1)
    y1 = jnp.minimum(y0 + 1, s - 1)

    def tap(yy, xx):
        return jnp.take(flat, base + yy * s + xx, axis=0)

    top = tap(y0, x0) * (1.0 - fx) + tap(y0, x1) * fx
    bot = tap(y1, x0) * (1.0 - fx) + tap(y1, x1) * fx
    return top * (1.0 - fy) + bot * fy


def reduce_light_bleeding(amt, clip_amt):
    """ReduceLightBleeding (EVSM.hlsl): clip the [0, clipAmt] tail and
    linearly rescale."""
    import jax.numpy as jnp
    return jnp.clip((amt - clip_amt) / (1.0 - clip_amt), 0.0, 1.0)


def chebyshev_upper_bound(m1, m2, mean, min_variance, bleed):
    """ChebyshevUpperBound (EVSM.hlsl): one-tailed variance bound."""
    import jax.numpy as jnp
    variance = jnp.maximum(m2 - m1 * m1, min_variance)
    d = mean - m1
    p_max = reduce_light_bleeding(variance / (variance + d * d), bleed)
    return jnp.where(mean <= m1, 1.0, p_max)


def _msm_hamburger(moments, fragment_depth, depth_bias, moment_bias):
    """ComputeMSMHamburger (MSM.hlsl): Cholesky-factorized Hankel solve of
    the 4-moment shadow bound, vectorized over lanes."""
    import jax.numpy as jnp

    b = moments * (1.0 - moment_bias) + 0.5 * moment_bias
    b0, b1, b2, b3 = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    z0 = fragment_depth - depth_bias

    l32_d22 = b2 - b0 * b1
    d22 = b1 - b0 * b0
    sq_depth_var = b3 - b1 * b1
    d33_d22 = sq_depth_var * d22 - l32_d22 * l32_d22
    inv_d22 = 1.0 / d22
    l32 = l32_d22 * inv_d22

    c1 = z0 - b0
    c2 = z0 * z0 - b1 - l32 * c1
    c1 = c1 * inv_d22
    c2 = c2 * d22 / d33_d22
    c1 = c1 - l32 * c2
    c0 = 1.0 - c1 * b0 - c2 * b1

    p = c1 / c2
    q = c0 / c2
    r = jnp.sqrt(jnp.maximum(p * p * 0.25 - q, 0.0))
    z1 = -p * 0.5 - r
    z2 = -p * 0.5 + r

    # switch weights for the three-delta solution
    case2 = z2 < z0          # -> (z1, z0, 1, 1)
    case1 = (~case2) & (z1 < z0)  # -> (z0, z1, 0, 1)
    sw0 = jnp.where(case2, z1, jnp.where(case1, z0, 0.0))
    sw1 = jnp.where(case2, z0, jnp.where(case1, z1, 0.0))
    sw2 = jnp.where(case2, 1.0, 0.0)
    sw3 = jnp.where(case2 | case1, 1.0, 0.0)
    denom = (z2 - sw1) * (z0 - z1)
    safe = jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    quotient = (sw0 * z2 - b0 * (sw0 + z2) + b1) / safe
    intensity = sw2 + sw3 * quotient
    return 1.0 - jnp.clip(intensity, 0.0, 1.0)


def sun_visibility_moments(moment_maps, cascades, pos_ws, normal_ws, n_dot_l,
                           depth_vs_normalized, mode: str):
    """SunShadowVisibility through the EVSM/MSM samplers
    (Shadows.hlsl:88-160): the same cascade selection + normal-offset
    projection as the PCF path, but one bilinear moment fetch + closed-form
    bound instead of the 7x7 comparison kernel."""
    import jax.numpy as jnp

    n_casc, s = moment_maps.shape[0], moment_maps.shape[1]
    splits = np.array([c.split_depth for c in cascades], np.float32)
    vps = jnp.asarray(np.stack([c.view_proj for c in cascades]))
    radii = jnp.asarray(np.array([c.radius for c in cascades], np.float32))

    cidx = select_cascade(depth_vs_normalized, splits)
    vp = jnp.take(vps, cidx, axis=0)
    radius = jnp.take(radii, cidx, axis=0)

    offset = (normal_ws * ((1.0 - jnp.clip(n_dot_l, 0.0, 1.0))
                           * 4.0 * (2.0 * radius / s))[..., None])
    p = pos_ws + offset
    hx = (p[:, 0] * vp[:, 0, 0] + p[:, 1] * vp[:, 1, 0]
          + p[:, 2] * vp[:, 2, 0] + vp[:, 3, 0])
    hy = (p[:, 0] * vp[:, 0, 1] + p[:, 1] * vp[:, 1, 1]
          + p[:, 2] * vp[:, 2, 1] + vp[:, 3, 1])
    hz = (p[:, 0] * vp[:, 0, 2] + p[:, 1] * vp[:, 1, 2]
          + p[:, 2] * vp[:, 2, 2] + vp[:, 3, 2])

    occ = _bilinear_fetch4(moment_maps, cidx, hx, hy)
    if mode == "evsm":
        exps = evsm_exponents()
        wpos, wneg = warp_depth(hz, exps)
        # derivative of the warp at depth -> minimum variance floor
        min_var_p = (1e-4 * exps[0] * wpos) ** 2
        min_var_n = (1e-4 * exps[1] * wneg) ** 2
        pos_c = chebyshev_upper_bound(occ[..., 0], occ[..., 2], wpos,
                                      min_var_p, LIGHT_BLEEDING_REDUCTION)
        neg_c = chebyshev_upper_bound(occ[..., 1], occ[..., 3], wneg,
                                      min_var_n, LIGHT_BLEEDING_REDUCTION)
        return jnp.minimum(pos_c, neg_c)
    if mode == "msm":
        raw = occ.at[..., 0].add(-_MSM_BIAS0) @ jnp.asarray(_MSM_DECODE)
        vis = _msm_hamburger(raw, hz, MSM_DEPTH_BIAS, MSM_MOMENT_BIAS)
        return reduce_light_bleeding(vis, LIGHT_BLEEDING_REDUCTION)
    raise ValueError(f"unknown moment mode {mode!r}")
