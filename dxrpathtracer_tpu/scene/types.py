"""Scene pytrees — the TPU-native replacement for the reference's GPU scene state.

The reference holds the scene in D3D12 structured buffers addressed through a
bindless descriptor heap (Model.cpp:851-881 vertex/index pools with global offsets,
SharedTypes.h:30-64 Material/GeometryInfo/SpotLight). Here the same data is a set
of immutable SoA device arrays in one pytree: XLA sees static shapes, gathers
replace descriptor-table indirections, and the whole scene is replicated to each
chip (Sponza-class scenes are far below HBM capacity).

Vertex layout parity: MeshVertex {Position, Normal, UV, Tangent, Bitangent}
(Graphics/Model.h:25-67). Triangles carry a material index (the flattened
equivalent of GeometryInfo.MaterialIdx per D3D12_RAYTRACING_GEOMETRY_DESC).
"""

import dataclasses
from functools import partial

import jax
import numpy as np

MAX_SPOT_LIGHTS = 32  # AppSettings.cs:92 MaxSpotLights
SPOT_LIGHT_RANGE = 7.5  # AppSettings.cs:94
SPOT_SHADOW_NEAR_CLIP = 0.1  # AppSettings.cs:96


def _register(cls, meta=()):
    data = tuple(f.name for f in dataclasses.fields(cls) if f.name not in meta)
    jax.tree_util.register_dataclass(cls, data_fields=list(data), meta_fields=list(meta))
    return cls


@partial(_register, meta=("num_textures",))
@dataclasses.dataclass(frozen=True)
class TextureAtlas:
    """Bindless-heap emulation: a flat texel pool. Every texture keeps its
    NATIVE resolution; all texels live row-major in one (total, 4) array and
    `meta[i] = (base, width, height)` locates texture i, so a (texture_idx,
    uv) tap is one small meta gather + four texel gathers — same gather count
    for any mix of texture sizes (the TPU analog of
    `ResourceDescriptorHeap[NonUniformResourceIndex(idx)]`,
    RayTrace.hlsl:171-221 / DescriptorTables.hlsl:12-18).

    The reference samples every material texture at mip 0 with a linear wrap
    sampler (RayTrace.hlsl:174,185,189,198 `SampleLevel(..., 0.0f)`), so a
    single-level pool reproduces its filtering exactly — no mip chain needed.
    """

    texels: jax.Array  # (total_texels, 4) float32 RGBA, linear space
    meta: jax.Array    # (num_textures, 3) int32: base texel, width, height
    num_textures: int = 0


@partial(_register, meta=("any_opacity",))
@dataclasses.dataclass(frozen=True)
class MaterialTable:
    """Per-material texture slots (SharedTypes.h:30-38 Material)."""

    albedo: jax.Array     # (M,) int32 texture indices
    normal: jax.Array
    roughness: jax.Array
    metallic: jax.Array
    opacity: jax.Array
    emissive: jax.Array
    has_opacity: jax.Array  # (M,) bool — mesh had an opacity map => alpha-test hit group
                            # (DXRPathTracer.cpp:1176-1199 hit-table selection)
    # One (M, 20) int32 row per material: (base, w, h) of each slot's texture
    # in PACKED_SLOTS order at columns [3k, 3k+3), has_opacity at column 18.
    # Shading gathers THIS row once per lane instead of 6 slot-index gathers
    # + 6 atlas-meta gathers — gathers are row-count bound on TPU, so the
    # material meta lookup collapses ~10 gathers to 1 (PERF_NOTES.md).
    # Built by pack_material_meta() in build_scene once the atlas exists.
    packed_meta: jax.Array | None = None
    any_opacity: bool = False  # static: scene contains alpha-tested materials at all


PACKED_SLOTS = ("albedo", "normal", "roughness", "metallic", "opacity",
                "emissive")


def pack_material_meta(materials: "MaterialTable", atlas_meta) -> np.ndarray:
    """(M, 20) int32 fused material+atlas meta rows (see MaterialTable)."""
    atlas_meta = np.asarray(atlas_meta)
    m = np.asarray(materials.albedo).shape[0]
    packed = np.zeros((m, 20), np.int32)
    for k, slot in enumerate(PACKED_SLOTS):
        idx = np.asarray(getattr(materials, slot), np.int64)
        packed[:, 3 * k:3 * k + 3] = atlas_meta[idx]
    packed[:, 18] = np.asarray(materials.has_opacity).astype(np.int32)
    return packed


# Per-triangle packed shading row (see pack_tri_shade): 3 x 14-float vertex
# blocks [pos(3) nrm(3) uv(2) tan(3) bit(3)], material id, pad, 20-int meta.
TRI_SHADE_WIDTH = 64          # f32 slots (256 B row)
TRI_SHADE_VTX = 14            # slots per vertex block
TRI_SHADE_MAT = 42            # bitcast(int32 material idx)
TRI_SHADE_META = 44           # bitcast(int32 packed_meta[20])


def pack_tri_shade(positions, normals, uvs, tangents, bitangents,
                   tri_idx, tri_material, packed_meta) -> np.ndarray:
    """(T, 64) f32 packed shading rows — everything _shade_vertex needs about
    a hit triangle in ONE gather.

    The reference's GetHitSurface (RayTrace.hlsl:444-464) reads 3 vertices
    from the bindless vertex buffer + the GeometryInfo/Material rows; the
    straight port costs ~16 row-count-bound gathers per shading vertex
    (tri_idx + 3 vertices x 5 attribute arrays) plus 2 material-meta gathers.
    Gathers are ROW-count bound on this TPU (PERF_NOTES.md), so the packed
    row collapses them to ONE (T, 64) 256 B gather; the barycentric lerp
    becomes a single fused A*w + B*u + C*v over three contiguous 14-wide
    blocks of the gathered row.

    Layout per row:
      [0:14)  vertex0 block: pos.xyz nrm.xyz uv.xy tan.xyz bit.xyz
      [14:28) vertex1 block, [28:42) vertex2 block (same order)
      [42]    bitcast(int32 material index)      [43] pad
      [44:64) bitcast(int32 packed_meta row)  (pack_material_meta)
    """
    tri_idx = np.asarray(tri_idx, np.int64)
    t = tri_idx.shape[0]
    out = np.zeros((t, TRI_SHADE_WIDTH), np.float32)
    attrs = (np.asarray(positions, np.float32),
             np.asarray(normals, np.float32),
             np.asarray(uvs, np.float32),
             np.asarray(tangents, np.float32),
             np.asarray(bitangents, np.float32))
    for vslot in range(3):
        sel = tri_idx[:, vslot]
        base = vslot * TRI_SHADE_VTX
        off = 0
        for arr in attrs:
            k = arr.shape[1]
            out[:, base + off:base + off + k] = arr[sel]
            off += k
    out[:, TRI_SHADE_MAT] = np.asarray(tri_material, np.int32).view(np.float32)
    pm = np.asarray(packed_meta, np.int32)
    out[:, TRI_SHADE_META:TRI_SHADE_META + pm.shape[1]] = \
        pm[np.asarray(tri_material, np.int64)].view(np.float32)
    return out


@partial(_register, meta=("num_lights",))
@dataclasses.dataclass(frozen=True)
class SpotLights:
    """Spot lights, padded to MAX_SPOT_LIGHTS (SharedTypes.h:40-48)."""

    position: jax.Array   # (L, 3)
    direction: jax.Array  # (L, 3)
    intensity: jax.Array  # (L, 3)
    angular_attenuation_x: jax.Array  # (L,) cos(inner/2)
    angular_attenuation_y: jax.Array  # (L,) cos(outer/2)
    range: jax.Array      # (L,)
    num_lights: int = 0


@_register
@dataclasses.dataclass(frozen=True)
class Scene:
    positions: jax.Array    # (V, 3) f32
    normals: jax.Array      # (V, 3) f32
    uvs: jax.Array          # (V, 2) f32
    tangents: jax.Array     # (V, 3) f32
    bitangents: jax.Array   # (V, 3) f32
    tri_idx: jax.Array      # (T, 3) int32 global vertex indices
    tri_material: jax.Array  # (T,) int32
    materials: MaterialTable
    textures: TextureAtlas
    lights: SpotLights
    # (T, 64) f32 packed shading rows (pack_tri_shade); None on scenes built
    # before it existed — _shade_vertex falls back to per-attribute gathers.
    tri_shade: jax.Array | None = None

    @property
    def num_triangles(self):
        return self.tri_idx.shape[0]

    @property
    def num_vertices(self):
        return self.positions.shape[0]


def make_spot_lights(positions=None, directions=None, intensities=None,
                     angular_attenuation=None, light_range=SPOT_LIGHT_RANGE):
    """Build a padded SpotLights pytree.

    Matches DXRPathTracer::InitializeScene (DXRPathTracer.cpp:965-980): stored
    direction is the negated model light direction, intensity is scaled x2500,
    angular attenuation values are cos(angle/2).
    """
    if positions is None or len(positions) == 0:
        z3 = np.zeros((MAX_SPOT_LIGHTS, 3), np.float32)
        z1 = np.zeros((MAX_SPOT_LIGHTS,), np.float32)
        return SpotLights(z3, z3, z3, z1, z1, z1 + light_range, num_lights=0)

    n = min(len(positions), MAX_SPOT_LIGHTS)

    def pad3(a):
        out = np.zeros((MAX_SPOT_LIGHTS, 3), np.float32)
        out[:n] = np.asarray(a, np.float32)[:n]
        return out

    def pad1(a):
        out = np.zeros((MAX_SPOT_LIGHTS,), np.float32)
        out[:n] = np.asarray(a, np.float32)[:n]
        return out

    ang = np.asarray(angular_attenuation, np.float32)[:n]  # (n, 2) inner/outer angles
    return SpotLights(
        position=pad3(positions),
        direction=pad3(directions),
        intensity=pad3(intensities),
        angular_attenuation_x=pad1(np.cos(ang[:, 0] * 0.5)),
        angular_attenuation_y=pad1(np.cos(ang[:, 1] * 0.5)),
        range=pad1(np.full(n, light_range, np.float32)),
        num_lights=n,
    )
