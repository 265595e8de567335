"""Independent oracle integrator — a deliberately naive recursive CPU path
tracer that re-implements the reference's PathTrace semantics
(RayTrace.hlsl:92-441) from scratch in numpy.

Purpose (VERDICT round-3, next-round #4): every image-level pin in the test
pyramid was the wavefront engine validating itself; a semantic bug shared by
the integrator and its goldens would be invisible. This module implements
the SAME spec a second time with NOTHING in common with the engine's compute
path:

  - intersection: chunked brute force over every triangle (no BVH, no
    packets, no compaction, no punch-through — alpha testing is a direct
    accept-filter on the full hit set, independently validating the
    punch-through construction);
  - shading: a literal recursive formulation of PathTrace
    (radiance = miss ? sky : local + throughput * radiance(bounce)),
    with its own numpy GGX/Fresnel/Smith/VNDF/concentric-disk/cubemap code
    written from the published formulas (BRDF.hlsl:16-261,
    Sampling.hlsl:72-205, the D3D TextureCube spec);
  - SHARED with the engine: scene loading (the Scene pytree's arrays and
    texture atlas are input data) and the CMJ sampler (core/cmj.py) —
    sharing the random streams makes the two implementations agree
    per-sample, not just in expectation, so a handful of samples pins
    RMSE at fp-noise level instead of MC-noise level.

tools/oracle_render.py renders the five presets at 64x64 and commits the
images; tests/test_oracle.py pins the engine against them (RMSE well under
the 1e-2 budget of BASELINE.md, standing in for the unobtainable reference
converged images).

Settings support: the default preset configuration (sun + area
approximation, sky, spot lights, albedo/normal maps, multiscatter
compensation, alpha testing within MaxAnyHitPathLength, white-furnace mode).
Unsupported toggles raise.
"""

import numpy as np

from ..app.settings import SPOT_SHADOW_NEAR_CLIP, AppSettings
from ..core import cmj
from ..core.constants import FP16Max, FP32Max

_PI = 3.14159265358979


def _nrm(v, eps=1e-37):
    n = np.sqrt(np.maximum((v * v).sum(-1, keepdims=True), eps * eps))
    return v / n


def _dot(a, b):
    return (a * b).sum(-1)


def _sat(x):
    return np.clip(x, 0.0, 1.0)


class OracleScene:
    """Host-numpy view of a Scene pytree + the data the oracle needs."""

    def __init__(self, scene):
        self.pos = np.asarray(scene.positions, np.float32)
        self.nrm = np.asarray(scene.normals, np.float32)
        self.uv = np.asarray(scene.uvs, np.float32)
        self.tan = np.asarray(scene.tangents, np.float32)
        self.bit = np.asarray(scene.bitangents, np.float32)
        self.tri = np.asarray(scene.tri_idx, np.int64)
        self.tri_mat = np.asarray(scene.tri_material, np.int64)
        self.v0 = self.pos[self.tri[:, 0]]
        self.e1 = self.pos[self.tri[:, 1]] - self.v0
        self.e2 = self.pos[self.tri[:, 2]] - self.v0
        m = scene.materials
        self.mat_slots = {k: np.asarray(getattr(m, k), np.int64)
                          for k in ("albedo", "normal", "roughness",
                                    "metallic", "opacity", "emissive")}
        self.has_opacity = np.asarray(m.has_opacity, bool)
        self.any_opacity = bool(m.any_opacity)
        self.texels = np.asarray(scene.textures.texels, np.float32)
        self.tex_meta = np.asarray(scene.textures.meta, np.int64)
        li = scene.lights
        self.lights = dict(
            position=np.asarray(li.position, np.float32),
            direction=np.asarray(li.direction, np.float32),
            intensity=np.asarray(li.intensity, np.float32),
            ax=np.asarray(li.angular_attenuation_x, np.float32),
            ay=np.asarray(li.angular_attenuation_y, np.float32),
            range=np.asarray(li.range, np.float32),
            num=int(li.num_lights))

    # -- own bilinear-wrap texture tap (engine: scene/textures.py) --
    def sample_tex(self, tex_idx, uv):
        base = self.tex_meta[tex_idx, 0]
        w = self.tex_meta[tex_idx, 1]
        h = self.tex_meta[tex_idx, 2]
        x = uv[..., 0] * w - 0.5
        y = uv[..., 1] * h - 0.5
        x0 = np.floor(x)
        y0 = np.floor(y)
        fx = (x - x0)[..., None]
        fy = (y - y0)[..., None]
        x0i = np.mod(x0.astype(np.int64), w)
        x1i = np.mod(x0i + 1, w)
        y0i = np.mod(y0.astype(np.int64), h)
        y1i = np.mod(y0i + 1, h)
        t00 = self.texels[base + y0i * w + x0i]
        t10 = self.texels[base + y0i * w + x1i]
        t01 = self.texels[base + y1i * w + x0i]
        t11 = self.texels[base + y1i * w + x1i]
        top = t00 + (t10 - t00) * fx
        bot = t01 + (t11 - t01) * fx
        return top + (bot - top) * fy

    def sample_mat(self, slot, mat_idx, uv):
        return self.sample_tex(self.mat_slots[slot][mat_idx], uv)

    # -- alpha accept (AnyHitShader, RayTrace.hlsl:485-507) --
    def alpha_accept(self, tri_id, u, v):
        mat = self.tri_mat[tri_id]
        has = self.has_opacity[mat]
        if not has.any():
            return np.ones(tri_id.shape, bool)
        t = self.tri[tri_id]
        w = (1.0 - u - v)[..., None]
        uv = (self.uv[t[..., 0]] * w + self.uv[t[..., 1]] * u[..., None]
              + self.uv[t[..., 2]] * v[..., None])
        op = self.sample_mat("opacity", mat, uv)[..., 0]
        return np.where(has, op >= 0.35, True)


# ---------------------------------------------------------------------------
# Own intersection: chunked brute force (no acceleration structure at all).

def _mt_chunk(o, d, v0, e1, e2, tmin, tmax):
    """(R, 3) rays x (C,) triangles -> (R, C) t/u/v/ok. f32 like the spec."""
    px = d[:, None, 1] * e2[None, :, 2] - d[:, None, 2] * e2[None, :, 1]
    py = d[:, None, 2] * e2[None, :, 0] - d[:, None, 0] * e2[None, :, 2]
    pz = d[:, None, 0] * e2[None, :, 1] - d[:, None, 1] * e2[None, :, 0]
    det = e1[None, :, 0] * px + e1[None, :, 1] * py + e1[None, :, 2] * pz
    ok = np.abs(det) > 1e-12
    inv = np.where(ok, 1.0 / np.where(det == 0, 1.0, det), 0.0)
    tx = o[:, None, 0] - v0[None, :, 0]
    ty = o[:, None, 1] - v0[None, :, 1]
    tz = o[:, None, 2] - v0[None, :, 2]
    u = (tx * px + ty * py + tz * pz) * inv
    qx = ty * e1[None, :, 2] - tz * e1[None, :, 1]
    qy = tz * e1[None, :, 0] - tx * e1[None, :, 2]
    qz = tx * e1[None, :, 1] - ty * e1[None, :, 0]
    v = (d[:, None, 0] * qx + d[:, None, 1] * qy + d[:, None, 2] * qz) * inv
    t = (e2[None, :, 0] * qx + e2[None, :, 1] * qy + e2[None, :, 2] * qz) * inv
    ok = (ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
          & (t >= tmin[:, None]) & (t < tmax[:, None]))
    return t, u, v, ok


def _closest(osc: OracleScene, o, d, tmin, tmax, active, alpha, chunk=8192):
    n = len(o)
    bt = np.array(tmax, np.float32).copy()
    btri = np.full(n, -1, np.int64)
    bu = np.zeros(n, np.float32)
    bv = np.zeros(n, np.float32)
    T = len(osc.v0)
    for c0 in range(0, T, chunk):
        c1 = min(c0 + chunk, T)
        t, u, v, ok = _mt_chunk(o, d, osc.v0[c0:c1], osc.e1[c0:c1],
                                osc.e2[c0:c1], tmin, bt)
        ok &= active[:, None]
        if alpha and osc.any_opacity:
            ri, ci = np.nonzero(ok)
            if len(ri):
                acc = osc.alpha_accept(c0 + ci, u[ri, ci], v[ri, ci])
                ok[ri, ci] &= acc
        # sentinel must exceed ANY possible tmax (FP32Max rays!): use +inf
        key = np.where(ok, t, np.inf)
        ci = np.argmin(key, axis=1)
        kt = key[np.arange(n), ci]
        win = kt < bt
        bt = np.where(win, kt, bt)
        btri = np.where(win, c0 + ci, btri)
        bu = np.where(win, u[np.arange(n), ci], bu)
        bv = np.where(win, v[np.arange(n), ci], bv)
    return bt, btri, bu, bv


def _any(osc: OracleScene, o, d, tmin, tmax, active, alpha, chunk=8192):
    """Visibility in {0,1} (ShadowPayload semantics)."""
    n = len(o)
    occluded = np.zeros(n, bool)
    T = len(osc.v0)
    for c0 in range(0, T, chunk):
        live = active & ~occluded
        if not live.any():
            break
        c1 = min(c0 + chunk, T)
        t, u, v, ok = _mt_chunk(o, d, osc.v0[c0:c1], osc.e1[c0:c1],
                                osc.e2[c0:c1], tmin, tmax)
        ok &= live[:, None]
        if alpha and osc.any_opacity:
            ri, ci = np.nonzero(ok)
            if len(ri):
                acc = osc.alpha_accept(c0 + ci, u[ri, ci], v[ri, ci])
                ok[ri, ci] &= acc
        occluded |= ok.any(axis=1)
    return np.where(occluded, 0.0, 1.0).astype(np.float32)


# ---------------------------------------------------------------------------
# Own BRDF / sampling math (published formulas, BRDF.hlsl / Sampling.hlsl).

def _fresnel(f0, h, l):
    ldh = _sat(_dot(l, h))[..., None]
    f = f0 + (1.0 - f0) * (1.0 - ldh) ** 5
    return f * _sat((f0 * 333.0).sum(-1, keepdims=True))


def _g1(a2, ndx):
    return 2.0 * ndx / (ndx + np.sqrt(a2 + (1.0 - a2) * ndx * ndx))


def _smith_g2(a2, ndl, ndv):
    da = ndv * np.sqrt(a2 + (1.0 - a2) * ndl * ndl)
    db = ndl * np.sqrt(a2 + (1.0 - a2) * ndv * ndv)
    return 2.0 * ndl * ndv / (da + db)


def _ggx_spec(m, ndh, ndl, ndv):
    m2 = m * m
    x = ndh * ndh * (m2 - 1.0) + 1.0
    dterm = m2 / (_PI * x * x)
    v1l = 1.0 / (ndl + np.sqrt(m2 + (1.0 - m2) * ndl * ndl))
    v1v = 1.0 / (ndv + np.sqrt(m2 + (1.0 - m2) * ndv * ndv))
    return dterm * v1l * v1v


def _env_brdf_scale(ndv, sr):
    ndv2 = ndv * ndv
    sr2 = sr * sr
    sr3 = sr2 * sr
    delta = (0.991086418474895 + 0.412367709802119 * sr * ndv2
             - 0.363848256078895 * sr2 - 0.758634385642633 * ndv * sr2)
    bias = _sat(0.0306613448029984 * sr
                + 0.0238299731830387 / (0.0272458171384516 + sr3 + ndv2)
                - 0.0454747751719356)
    return _sat(delta - bias)


def _concentric_disk(x, y):
    a = 2.0 * x - 1.0
    b = 2.0 * y - 1.0

    def sdiv(p, q):
        return p / np.where(q == 0.0, 1.0, q)

    r12 = a > -b
    ab = a > b
    alt = a < b
    r = np.where(r12, np.where(ab, a, b), np.where(alt, -a, -b))
    phi = np.where(r12,
                   np.where(ab, (_PI / 4) * sdiv(b, a),
                            (_PI / 4) * (2.0 - sdiv(a, b))),
                   np.where(alt, (_PI / 4) * (4.0 + sdiv(b, a)),
                            np.where(b != 0.0,
                                     (_PI / 4) * (6.0 - sdiv(a, b)), 0.0)))
    return r * np.cos(phi), r * np.sin(phi)


def _cosine_hemisphere(u1, u2):
    u, v = _concentric_disk(u1, u2)
    z = np.sqrt(np.maximum(0.0, 1.0 - u * u - v * v))
    return np.stack([u, v, z], -1)


def _vndf(wo, ax, ay, u1, u2):
    v = np.stack([wo[..., 0] * ax, wo[..., 1] * ay, wo[..., 2]], -1)
    v = _nrm(v)
    vz = v[..., 2]
    cvz = np.stack([v[..., 1], -v[..., 0], np.zeros_like(vz)], -1)
    cl = np.sqrt((cvz * cvz).sum(-1, keepdims=True))
    t1 = np.where((vz < 0.999)[..., None], cvz / np.where(cl == 0, 1, cl),
                  np.array([1.0, 0.0, 0.0], np.float32))
    t2 = np.cross(t1, v)
    a = 1.0 / (1.0 + vz)
    # u1 is negative on lanes that picked the other lobe (the engine's
    # remap does the same; those lanes never read this result)
    r = np.sqrt(np.maximum(u1, 0.0))
    lower = u2 < a
    phi = np.where(lower, (u2 / a) * _PI, _PI + (u2 - a) / (1.0 - a) * _PI)
    p1 = r * np.cos(phi)
    p2 = r * np.sin(phi) * np.where(lower, 1.0, vz)
    nvec = (p1[..., None] * t1 + p2[..., None] * t2
            + np.sqrt(np.maximum(0.0, 1.0 - p1 * p1 - p2 * p2))[..., None] * v)
    nvec = np.stack([ax * nvec[..., 0], ay * nvec[..., 1],
                     np.maximum(0.0, nvec[..., 2])], -1)
    return _nrm(nvec)


def _calc_lighting(normal, ldir, irr, diff_alb, spec_alb, rough, pos,
                   campos, comp):
    lighting = diff_alb * (1.0 / 3.14159)
    view = _nrm(campos[None, :] - pos)
    ndl = _sat(_dot(normal, ldir))
    h = _nrm(view + ldir)
    f = _fresnel(spec_alb, h, ldir)
    ndh = _sat(_dot(normal, h))
    ndv = _sat(_dot(normal, view))
    spec = _ggx_spec(rough, ndh, ndl, ndv)
    lighting = lighting + np.where((ndl > 0)[..., None],
                                   spec[..., None] * f * comp, 0.0)
    return lighting * ndl[..., None] * irr[None, :]


def _sample_cube(cube, d):
    """Own D3D TextureCube bilinear sampler (clamp addressing)."""
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    is_x = (ax >= ay) & (ax >= az)
    is_y = (~is_x) & (ay >= az)
    ma = np.maximum(np.where(is_x, ax, np.where(is_y, ay, az)), 1e-20)
    face = np.where(is_x, np.where(x >= 0, 0, 1),
                    np.where(is_y, np.where(y >= 0, 2, 3),
                             np.where(z >= 0, 4, 5)))
    sc = np.where(is_x, np.where(x >= 0, -z, z),
                  np.where(is_y, x, np.where(z >= 0, x, -x)))
    tc = np.where(is_x, -y, np.where(is_y, np.where(y >= 0, z, -z), -y))
    u = (sc / ma + 1.0) * 0.5
    v = (tc / ma + 1.0) * 0.5
    r = cube.shape[1]
    xx = u * r - 0.5
    yy = v * r - 0.5
    x0 = np.floor(xx)
    y0 = np.floor(yy)
    fx = (xx - x0)[..., None]
    fy = (yy - y0)[..., None]
    x0i = np.clip(x0.astype(np.int64), 0, r - 1)
    x1i = np.clip(x0i + 1, 0, r - 1)
    y0i = np.clip(y0.astype(np.int64), 0, r - 1)
    y1i = np.clip(y0i + 1, 0, r - 1)
    t00 = cube[face, y0i, x0i]
    t10 = cube[face, y0i, x1i]
    t01 = cube[face, y1i, x0i]
    t11 = cube[face, y1i, x1i]
    top = t00 + (t10 - t00) * fx
    bot = t01 + (t11 - t01) * fx
    return top + (bot - top) * fy


# ---------------------------------------------------------------------------

class OracleRenderer:
    """Recursive reference path tracer over a Scene + camera + sky."""

    def __init__(self, scene, settings: AppSettings, camera, sky_cube,
                 sun_irradiance, sun_render_color):
        s = settings
        # supported configuration envelope
        assert s.enable_ray_tracing
        assert s.enable_indirect and s.enable_diffuse and s.enable_specular
        assert s.enable_direct
        assert not s.avoid_caustic_paths and not s.clamp_roughness
        self.s = s
        self.osc = OracleScene(scene)
        self.cam = camera
        self.cube = np.asarray(sky_cube, np.float32)
        sd = np.asarray(s.sun_direction, np.float32)
        self.sun_dir = sd / np.linalg.norm(sd)
        self.sun_irr = np.asarray(sun_irradiance, np.float32)
        self.sun_color = np.asarray(sun_render_color, np.float32)
        ang = np.deg2rad(s.sun_size)
        self.cos_sun = np.float32(np.cos(ang))
        self.sin_sun = np.float32(np.sin(ang))
        self.furnace = bool(s.enable_white_furnace_mode)

    def _cmj(self, sample_idx, pattern):
        sq = int(self.s.sqrt_num_samples)
        out = cmj.sample_cmj_2d(np.uint32(sample_idx), sq, sq,
                                np.asarray(pattern, np.uint32))
        return np.asarray(out)

    def _sky(self, d):
        if self.furnace:
            return np.ones((len(d), 3), np.float32)
        if not self.s.enable_sky:
            return np.zeros((len(d), 3), np.float32)
        return _sample_cube(self.cube, d)

    # -- the recursion: PathTrace (RayTrace.hlsl:151-441) --
    def _radiance(self, o, d, tmin, tmax, active, depth, pixel_idx,
                  total_pixels, sample_idx, first_set_idx):
        s = self.s
        osc = self.osc
        n = len(o)
        last_depth = max(int(s.max_path_length) - 1, 1)
        use_any_hit = depth <= s.max_any_hit_path_length
        bt, btri, bu, bv = _closest(osc, o, d, tmin, tmax, active,
                                    alpha=use_any_hit)
        hit = (btri >= 0) & active
        missed = active & ~hit

        out = np.zeros((n, 3), np.float32)
        # miss shader (:509-530)
        miss_rad = self._sky(d)
        if depth == 1 and not self.furnace:
            in_disc = _dot(d, self.sun_dir[None, :]) >= self.cos_sun
            miss_rad = np.where(in_disc[..., None], self.sun_color[None, :],
                                miss_rad)
        out[missed] = miss_rad[missed]
        if not hit.any():
            return out

        # hit surface (GetHitSurface, :444-464)
        ti = np.maximum(btri, 0)
        tr = osc.tri[ti]
        w = (1.0 - bu - bv)[..., None]
        uu = bu[..., None]
        vv = bv[..., None]

        def lerp3(arr):
            return arr[tr[:, 0]] * w + arr[tr[:, 1]] * uu + arr[tr[:, 2]] * vv

        pos = lerp3(osc.pos)
        geo_n = _nrm(lerp3(osc.nrm))
        uv = lerp3(osc.uv)
        tan = _nrm(lerp3(osc.tan))
        bit = _nrm(lerp3(osc.bit))
        mat = osc.tri_mat[ti]

        normal = geo_n
        if s.enable_normal_maps:
            nm = osc.sample_mat("normal", mat, uv)
            nx = nm[..., 0] * 2.0 - 1.0
            ny = nm[..., 1] * 2.0 - 1.0
            nz = np.sqrt(np.maximum(1.0 - _sat(nx * nx + ny * ny), 0.0))
            normal = _nrm(nx[..., None] * tan + ny[..., None] * bit
                          + nz[..., None] * geo_n)

        if s.enable_albedo_maps and not self.furnace:
            base_color = osc.sample_mat("albedo", mat, uv)[..., :3]
        else:
            base_color = np.ones((n, 3), np.float32)
        if self.furnace:
            metallic = _sat(np.ones(n, np.float32) * s.metallic_scale)
            sqrt_rough = _sat(np.ones(n, np.float32) * s.roughness_scale)
        else:
            metallic = _sat(osc.sample_mat("metallic", mat, uv)[..., 0]
                            * s.metallic_scale)
            sqrt_rough = _sat(osc.sample_mat("roughness", mat, uv)[..., 0]
                              * s.roughness_scale)

        en_diff = (metallic < 1.0) | self.furnace
        # per-lane specular gating (RayTrace.hlsl:191-195): indirect
        # specular off (the default) restricts specular to depth 1
        if s.enable_indirect_specular:
            en_spec = np.ones(n, bool)
        else:
            en_spec = np.full(n, depth == 1)
        lane_dead = ~(en_diff | en_spec)   # hlsl:194-195: return 0
        diff_alb = ((1.0 - metallic)[..., None] * base_color
                    * en_diff[..., None])
        spec_alb = ((0.03 + (base_color - 0.03) * metallic[..., None])
                    * en_spec[..., None])
        rough = sqrt_rough * sqrt_rough

        comp = np.ones((n, 3), np.float32)
        if s.apply_multiscattering_energy_compensation:
            ndv = _sat(_dot(normal, -d))
            ess = _env_brdf_scale(ndv, sqrt_rough)
            comp = 1.0 + spec_alb * (1.0 / ess[..., None] - 1.0)

        local = (np.zeros((n, 3), np.float32) if self.furnace
                 else osc.sample_mat("emissive", mat, uv)[..., :3])

        # sun NEE (:224-262)
        if s.enable_sun and not self.furnace:
            sun_d = self.sun_dir[None, :]
            if s.sun_area_light_approximation:
                r_vec = d - 2.0 * _dot(d, normal)[..., None] * normal
                ddr = _dot(sun_d, r_vec)
                s_vec = r_vec - ddr[..., None] * sun_d
                closest_d = (self.cos_sun * sun_d
                             + _nrm(s_vec) * self.sin_sun)
                shade_dir = np.where((ddr < self.cos_sun)[..., None],
                                     _nrm(closest_d), r_vec)
            else:
                shade_dir = np.broadcast_to(sun_d, (n, 3))
            vis = _any(osc, pos, np.broadcast_to(sun_d, (n, 3)),
                       np.full(n, 1e-5, np.float32),
                       np.full(n, FP32Max, np.float32),
                       hit, alpha=use_any_hit)
            local = local + _calc_lighting(
                normal, shade_dir, self.sun_irr, diff_alb, spec_alb, rough,
                pos, np.asarray(self.cam.position, np.float32),
                comp) * vis[..., None]

        # spot lights (:264-313)
        L = self.osc.lights
        nl = min(L["num"], int(s.max_light_clamp))
        if s.render_lights and nl > 0 and not self.furnace:
            for li in range(nl):
                to_l = L["position"][li][None, :] - pos
                dist = np.sqrt(np.maximum(_dot(to_l, to_l), 1e-20))
                to_l = to_l / dist[..., None]
                angle_f = _sat(_dot(to_l, L["direction"][li][None, :]))
                ax_, ay_ = L["ax"][li], L["ay"][li]
                tt = _sat((angle_f - ay_) / np.where(ax_ == ay_, 1.0,
                                                     ax_ - ay_))
                ang = tt * tt * (3.0 - 2.0 * tt)
                dd = dist / L["range"][li]
                fall = _sat(1.0 - dd ** 4)
                fall = (fall * fall) / (dist * dist + 1.0)
                ang = ang * fall
                rel = hit & (ang > 0.0) & (_dot(normal, to_l) > 0.0)
                vis = _any(osc, pos + normal * 0.01, to_l,
                           np.full(n, SPOT_SHADOW_NEAR_CLIP, np.float32),
                           np.maximum(dist - SPOT_SHADOW_NEAR_CLIP,
                                      SPOT_SHADOW_NEAR_CLIP),
                           rel, alpha=use_any_hit)
                light = _calc_lighting(
                    normal, to_l, np.ones(3, np.float32), diff_alb, spec_alb,
                    rough, pos, np.asarray(self.cam.position, np.float32),
                    comp) * (L["intensity"][li][None, :] * ang[..., None])
                local = local + np.where(rel[..., None],
                                         light * vis[..., None], 0.0)

        if depth == 1 and not s.enable_direct:
            local = np.zeros_like(local)

        # BRDF sampling (:315-376) — shared CMJ streams, own mappings
        set_idx = first_set_idx + (depth - 1)
        perm = (np.uint32(set_idx) * np.uint32(total_pixels)
                + pixel_idx.astype(np.uint32))
        uv2 = self._cmj(sample_idx, perm)
        bx, by = uv2[..., 0].astype(np.float32), uv2[..., 1].astype(np.float32)
        selector = np.where(en_spec, bx, 0.0)
        selector = np.where(en_diff, selector, 1.0)
        pick_diff = selector < 0.5

        bx_d = np.where(en_spec, bx * 2.0, bx)
        dir_diff = _cosine_hemisphere(bx_d, by)

        bx_s = np.where(en_diff, (bx - 0.5) * 2.0, bx)
        inc_ts = _nrm(np.stack([_dot(d, tan), _dot(d, bit),
                                _dot(d, normal)], -1))
        m_ts = _vndf(-inc_ts, rough, rough, bx_s, by)
        dir_spec = inc_ts - 2.0 * _dot(inc_ts, m_ts)[..., None] * m_ts
        if self.furnace:
            fres = np.ones((n, 3), np.float32)
        else:
            fres = _fresnel(spec_alb, m_ts, dir_spec)
        a2 = rough * rough
        nz_ = _sat(-inc_ts[..., 2])
        g1v = _g1(a2, nz_)
        ndl_s = _sat(dir_spec[..., 2])
        g2v = _smith_g2(a2, ndl_s, nz_)
        thr_spec = fres * (g2v / np.where(g1v == 0.0, 1.0, g1v))[..., None]
        if s.apply_multiscattering_energy_compensation:
            # reference quirk: ndv = saturate(-rayDirWS.z)
            ndv_q = _sat(-d[..., 2])
            ess_q = _env_brdf_scale(ndv_q, sqrt_rough)
            thr_spec = thr_spec * (1.0 + spec_alb * (1.0 / ess_q[..., None]
                                                     - 1.0))
        dir_ts = np.where(pick_diff[..., None], dir_diff, dir_spec)
        throughput = np.where(pick_diff[..., None], diff_alb, thr_spec)
        dir_ws = _nrm(dir_ts[..., 0:1] * tan + dir_ts[..., 1:2] * bit
                      + dir_ts[..., 2:3] * normal)
        throughput = np.where((en_diff & en_spec)[..., None],
                              throughput * 2.0, throughput)

        if self.furnace:
            # furnace mode traces ONE vertex: _depth_schedule sets
            # continue_paths False whenever furnace is on, and _apply_vertex
            # replaces local with the BRDF throughput (RayTrace.hlsl furnace
            # semantics via integrator flags).
            local = throughput
        elif depth >= last_depth:
            # terminal vertex (:411-438)
            term_alpha = (depth + 1) <= s.max_any_hit_path_length
            vis = _any(osc, pos, dir_ws, np.full(n, 1e-5, np.float32),
                       np.full(n, FP32Max, np.float32), hit,
                       alpha=term_alpha)
            local = local + vis[..., None] * self._sky(dir_ws) * throughput
        else:
            child = self._radiance(
                pos, dir_ws, np.full(n, 1e-5, np.float32),
                np.full(n, FP32Max, np.float32), hit, depth + 1,
                pixel_idx, total_pixels, sample_idx, first_set_idx)
            local = local + throughput * child

        out[hit & ~lane_dead] = local[hit & ~lane_dead]
        return out

    # -- raygen + progressive accumulation (RaygenShader, :92-149) --
    def render(self, width, height, num_samples):
        s = self.s
        n = width * height
        yy, xx = np.meshgrid(np.arange(height, dtype=np.float32),
                             np.arange(width, dtype=np.float32),
                             indexing="ij")
        pixel_idx = (yy * width + xx).reshape(-1).astype(np.uint32)
        ivp = np.asarray(self.cam.inv_view_projection(), np.float32)
        accum = np.zeros((n, 3), np.float32)
        for k in range(num_samples):
            jit = self._cmj(k, pixel_idx)
            px = xx.reshape(-1) + jit[..., 0]
            py = yy.reshape(-1) + jit[..., 1]
            ncx = px / (width * 0.5) - 1.0
            ncy = -(py / (height * 0.5) - 1.0)

            def unproject(z):
                outp = (ncx[..., None] * ivp[0] + ncy[..., None] * ivp[1]
                        + z * ivp[2] + ivp[3])
                return outp[..., :3] / outp[..., 3:4]

            start = unproject(0.0).astype(np.float32)
            end = unproject(1.0).astype(np.float32)
            seg = end - start
            length = np.sqrt(np.maximum(_dot(seg, seg), 1e-30))
            dirs = seg / length[..., None]
            rad = self._radiance(start, dirs, np.zeros(n, np.float32),
                                 length.astype(np.float32),
                                 np.ones(n, bool), 1, pixel_idx, n, k, 1)
            rad = np.clip(rad, 0.0, FP16Max)
            lerp = np.float32(k) / np.float32(k + 1)
            accum = rad + (accum - rad) * lerp
        return accum.reshape(height, width, 3)
