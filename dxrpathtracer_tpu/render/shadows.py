"""Cascaded shadow-map math — the ShadowHelper equivalent.

Parity with ShadowHelper::PrepareCascades (Graphics/ShadowHelper.h:25-108 /
ShadowHelper.cpp): 4 stabilized cascades over the camera frustum, each an
orthographic light-space projection whose bounding sphere is texel-snapped so
cascade edges don't shimmer under camera motion.

TPU-native substitution: the reference renders 2048^2 depth maps per cascade
and samples with PCF (Shadows.hlsl:90-352); here sun/spot visibility is
resolved with exact shadow RAYS through the same BVH used for path tracing
(strictly higher quality than depth+PCF, no resolution/peter-panning
artifacts). The cascade machinery is still used for parity of the API (split
scheme, light matrices, cascade selection) and by any consumer that wants
map-based shadows.
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
        light_view = _look_at_lh(center - sun_direction * radius * 2.0, center, up)
        texel = (2.0 * radius) / map_size
        c_ls = np.append(center, 1.0) @ light_view
        c_ls[:2] = np.floor(c_ls[:2] / texel) * texel
        center_snapped = (np.append(c_ls[:3], 1.0) @ np.linalg.inv(light_view))[:3]
        light_view = _look_at_lh(center_snapped - sun_direction * radius * 2.0,
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
