"""Surface-map generation (the bake G-buffer).

Parity with RenderSurfaceMap/SurfaceMap.hlsl:35-94: for every lightmap texel,
world position (w = coverage), normalized world normal, and albedo sampled at
the surface's texture UV. The reference rasterizes lightmap-UV geometry at
4096^2; with the analytic atlas (bake/lightmap_uv.py) the texel -> triangle
mapping is closed form, so this becomes one vectorized gather+interpolate pass.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..scene.textures import sample_bilinear_wrap
from .lightmap_uv import LightmapAtlas, texel_to_triangle


def atlas_texel_map(atlas, resolution: int):
    """(tri_map, bu, bv) for either atlas flavor: closed form for the
    analytic pair atlas, rasterization + gutter dilation for ChartedAtlas."""
    from .charts import ChartedAtlas, rasterize_texel_map
    if isinstance(atlas, ChartedAtlas):
        tri_map, bu, bv, _cov = rasterize_texel_map(atlas.tri_uv, resolution)
        return tri_map, bu, bv
    return texel_to_triangle(atlas, resolution)


def build_surface_maps(scene, atlas, resolution: int):
    """Returns dict of device arrays:
    position (S,S,4) [xyz | coverage], normal (S,S,3), albedo (S,S,3)."""
    tri_map, bu, bv = atlas_texel_map(atlas, resolution)
    tri_map_d = jnp.asarray(tri_map.reshape(-1))
    bu_d = jnp.asarray(bu.reshape(-1))
    bv_d = jnp.asarray(bv.reshape(-1))

    tri_idx = jnp.asarray(np.asarray(scene.tri_idx))
    positions = jnp.asarray(np.asarray(scene.positions))
    normals = jnp.asarray(np.asarray(scene.normals))
    uvs = jnp.asarray(np.asarray(scene.uvs))
    tri_material = jnp.asarray(np.asarray(scene.tri_material))

    safe_tri = jnp.maximum(tri_map_d, 0)
    tri = jnp.take(tri_idx, safe_tri, axis=0)  # (N, 3)
    w = (1.0 - bu_d - bv_d)[..., None]
    uu = bu_d[..., None]
    vv = bv_d[..., None]

    def lerp3(arr):
        return (jnp.take(arr, tri[:, 0], axis=0) * w
                + jnp.take(arr, tri[:, 1], axis=0) * uu
                + jnp.take(arr, tri[:, 2], axis=0) * vv)

    pos = lerp3(positions)
    nrm = lerp3(normals)
    nrm = nrm / jnp.maximum(jnp.linalg.norm(nrm, axis=-1, keepdims=True), 1e-12)
    uv = lerp3(uvs)

    mat = jnp.take(tri_material, safe_tri, axis=0)
    alb_tex = jnp.take(jnp.asarray(np.asarray(scene.materials.albedo)), mat, axis=0)
    albedo = sample_bilinear_wrap(
        jax.tree_util.tree_map(jnp.asarray, scene.textures), alb_tex, uv)[..., :3]

    coverage = (tri_map_d >= 0).astype(jnp.float32)
    s = resolution
    return {
        "position": jnp.concatenate([pos, coverage[..., None]], -1).reshape(s, s, 4),
        "normal": (nrm * coverage[..., None]).reshape(s, s, 3),
        "albedo": (albedo * coverage[..., None]).reshape(s, s, 3),
    }
