"""Assemble Scene pytrees from host MeshData lists.

The flattening mirrors Model::CreateBuffers (Model.cpp:851-881): one global vertex
pool and one global index pool with per-mesh offsets — except offsets are applied
eagerly so triangles address the global pool directly (the GeometryInfo
{VtxOffset, IdxOffset, MaterialIdx} side table of SharedTypes.h:58-64 collapses
into a per-triangle material id).
"""

import jax.numpy as jnp
import numpy as np

import dataclasses

from .procedural import MeshData
from .textures import AtlasBuilder, default_material_table
from .types import (MaterialTable, Scene, SpotLights, make_spot_lights,
                    pack_material_meta, pack_tri_shade)


def flatten_meshes(meshes: list[MeshData]):
    """Concatenate meshes into global SoA pools with offset-applied indices."""
    positions, normals, uvs, tangents, bitangents = [], [], [], [], []
    tri_idx, tri_material = [], []
    v_off = 0
    for mesh in meshes:
        positions.append(mesh.positions)
        normals.append(mesh.normals)
        uvs.append(mesh.uvs)
        tangents.append(mesh.tangents)
        bitangents.append(mesh.bitangents)
        tri = mesh.indices.reshape(-1, 3).astype(np.int64) + v_off
        tri_idx.append(tri)
        tri_material.append(np.full(tri.shape[0], mesh.material_idx, np.int32))
        v_off += mesh.positions.shape[0]
    return (
        np.concatenate(positions).astype(np.float32),
        np.concatenate(normals).astype(np.float32),
        np.concatenate(uvs).astype(np.float32),
        np.concatenate(tangents).astype(np.float32),
        np.concatenate(bitangents).astype(np.float32),
        np.concatenate(tri_idx).astype(np.int32),
        np.concatenate(tri_material).astype(np.int32),
    )


def build_scene(meshes: list[MeshData], materials: MaterialTable | None = None,
                atlas_builder: AtlasBuilder | None = None,
                lights: SpotLights | None = None) -> Scene:
    """Build a Scene pytree with HOST (numpy) leaves.

    Keeping the scene on host until one explicit `jax.device_put(scene)` avoids
    dozens of small per-array transfers (expensive over the tunneled TPU) and
    lets the LBVH builder read vertices without device->host readbacks.
    """
    pos, nrm, uv, tan, bit, tri, tri_mat = flatten_meshes(meshes)
    if atlas_builder is None:
        atlas_builder = AtlasBuilder()
    if materials is None:
        num_materials = int(tri_mat.max()) + 1 if tri_mat.size else 1
        materials = default_material_table(num_materials, atlas_builder)
    if lights is None:
        lights = make_spot_lights()
    atlas = atlas_builder.build()
    materials = dataclasses.replace(
        materials, packed_meta=pack_material_meta(materials, atlas.meta))
    return Scene(
        positions=pos,
        normals=nrm,
        uvs=uv,
        tangents=tan,
        bitangents=bit,
        tri_idx=tri,
        tri_material=tri_mat,
        materials=materials,
        textures=atlas,
        lights=lights,
        tri_shade=pack_tri_shade(pos, nrm, uv, tan, bit, tri, tri_mat,
                                 materials.packed_meta),
    )
