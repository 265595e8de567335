"""Minimal binary-FBX mesh importer (host-side, numpy).

The reference imports scenes through Assimp (Model::CreateWithAssimp,
Graphics/Model.cpp:435-560: positions scaled by SceneScale, normals/UVs/
tangents/bitangents, per-mesh material with 6 texture slots, spot/point light
extraction). Assimp is unavailable here, so this module parses the FBX 7.x
binary container directly: node records, property lists, zlib-compressed
arrays — enough to extract Geometry (vertices, polygons, normals, UVs) and
Model transforms.

Implemented incrementally; `load_fbx_meshes` raises on unsupported files and
callers fall back to procedural stand-ins.
"""

import struct
import zlib
from pathlib import Path

import numpy as np

from .procedural import MeshData

_MAGIC = b"Kaydara FBX Binary  \x00"


class FBXNode:
    __slots__ = ("name", "props", "children")

    def __init__(self, name, props, children):
        self.name = name
        self.props = props
        self.children = children

    def find(self, name):
        return [c for c in self.children if c.name == name]

    def first(self, name):
        for c in self.children:
            if c.name == name:
                return c
        return None


def _read_prop(buf, off):
    t = buf[off:off + 1]
    off += 1
    if t == b"Y":
        return struct.unpack_from("<h", buf, off)[0], off + 2
    if t == b"C":
        return bool(buf[off]), off + 1
    if t == b"I":
        return struct.unpack_from("<i", buf, off)[0], off + 4
    if t == b"F":
        return struct.unpack_from("<f", buf, off)[0], off + 4
    if t == b"D":
        return struct.unpack_from("<d", buf, off)[0], off + 8
    if t == b"L":
        return struct.unpack_from("<q", buf, off)[0], off + 8
    if t in (b"f", b"d", b"l", b"i", b"b"):
        n, enc, clen = struct.unpack_from("<III", buf, off)
        off += 12
        raw = buf[off:off + clen] if enc else None
        dt = {b"f": "<f4", b"d": "<f8", b"l": "<i8", b"i": "<i4", b"b": "<i1"}[t]
        if enc:
            data = np.frombuffer(zlib.decompress(raw), dt, count=n)
            off += clen
        else:
            size = n * np.dtype(dt).itemsize
            data = np.frombuffer(buf[off:off + size], dt, count=n)
            off += size
        return data, off
    if t == b"S":
        n = struct.unpack_from("<I", buf, off)[0]
        off += 4
        return buf[off:off + n].decode("utf-8", errors="replace"), off + n
    if t == b"R":
        n = struct.unpack_from("<I", buf, off)[0]
        off += 4
        return buf[off:off + n], off + n
    raise ValueError(f"unknown FBX property type {t!r}")


def _read_node(buf, off, version):
    if version >= 7500:
        end, nprops, _plen = struct.unpack_from("<QQQ", buf, off)
        off += 24
    else:
        end, nprops, _plen = struct.unpack_from("<III", buf, off)
        off += 12
    name_len = buf[off]
    off += 1
    name = buf[off:off + name_len].decode("utf-8", errors="replace")
    off += name_len
    if end == 0:
        return None, off
    props = []
    for _ in range(nprops):
        p, off = _read_prop(buf, off)
        props.append(p)
    children = []
    while off < end:
        child, off = _read_node(buf, off, version)
        if child is None:
            break
        children.append(child)
    return FBXNode(name, props, children), end


def parse_fbx(path) -> tuple[FBXNode, int]:
    buf = Path(path).read_bytes()
    if not buf.startswith(_MAGIC):
        raise ValueError("not a binary FBX file")
    version = struct.unpack_from("<I", buf, 23)[0]
    off = 27
    roots = []
    while off < len(buf):
        node, off = _read_node(buf, off, version)
        if node is None:
            break
        roots.append(node)
    return FBXNode("", [], roots), version


def _layer_to_per_vertex(data, index_node, mapping, ref, poly_vertex_idx, n_comp):
    """Expand an FBX layer element to per-polygon-vertex values."""
    data = np.asarray(data, np.float64).reshape(-1, n_comp)
    cp_idx = np.where(poly_vertex_idx < 0, -poly_vertex_idx - 1, poly_vertex_idx)
    if ref == "IndexToDirect" and index_node is not None:
        idx = np.asarray(index_node, np.int64)
        if mapping == "ByPolygonVertex":
            return data[idx]
        if mapping == "ByControlPoint":
            return data[idx][cp_idx]
    if mapping == "ByPolygonVertex":
        return data
    if mapping == "ByControlPoint":
        return data[cp_idx]
    raise ValueError(f"unsupported FBX mapping {mapping}/{ref}")


def _triangulate(poly_idx):
    """FBX polygon index list (negative marks last vtx, xor -1) -> triangle fan
    indices *into the polygon-vertex stream* + control-point indices."""
    ends = np.where(poly_idx < 0)[0]
    tris = []
    start = 0
    for e in ends:
        count = e - start + 1
        for k in range(1, count - 1):
            tris.append((start, start + k, start + k + 1))
        start = e + 1
    return np.asarray(tris, np.int64)


def load_fbx_meshes(path, scene_scale: float = 1.0) -> list[MeshData]:
    root, _version = parse_fbx(path)
    objects = root.first("Objects")
    if objects is None:
        raise ValueError("no Objects node")

    meshes = []
    for geo in objects.find("Geometry"):
        v_node = geo.first("Vertices")
        i_node = geo.first("PolygonVertexIndex")
        if v_node is None or i_node is None:
            continue
        verts = np.asarray(v_node.props[0], np.float64).reshape(-1, 3)
        poly_idx = np.asarray(i_node.props[0], np.int64)
        tris_pv = _triangulate(poly_idx)  # (T, 3) into polygon-vertex stream
        cp = np.where(poly_idx < 0, -poly_idx - 1, poly_idx)

        # Normals
        normals = None
        ln = geo.first("LayerElementNormal")
        if ln is not None:
            mapping = ln.first("MappingInformationType").props[0]
            ref = ln.first("ReferenceInformationType").props[0]
            ndata = ln.first("Normals").props[0]
            nidx = ln.first("NormalsIndex")
            normals = _layer_to_per_vertex(
                ndata, nidx.props[0] if nidx else None, mapping, ref, poly_idx, 3)

        # UVs
        uvs = None
        lu = geo.first("LayerElementUV")
        if lu is not None:
            mapping = lu.first("MappingInformationType").props[0]
            ref = lu.first("ReferenceInformationType").props[0]
            udata = lu.first("UV").props[0]
            uidx = lu.first("UVIndex")
            uvs = _layer_to_per_vertex(
                udata, uidx.props[0] if uidx else None, mapping, ref, poly_idx, 2)

        # Flatten to per-polygon-vertex geometry (simple and robust; vertex
        # dedup is an optimization for later rounds).
        pv_count = len(poly_idx)
        pos_pv = verts[cp] * scene_scale
        nrm_pv = normals if normals is not None else np.zeros((pv_count, 3))
        uv_pv = uvs if uvs is not None else np.zeros((pv_count, 2))
        # FBX V coordinate is bottom-up; D3D samples top-down (Assimp flips UVs
        # via aiProcess_FlipUVs in the reference, Model.cpp:509-520).
        uv_pv = np.stack([uv_pv[:, 0], 1.0 - uv_pv[:, 1]], -1)

        tri = tris_pv
        used = tri.reshape(-1)
        pos = pos_pv[used].reshape(-1, 3)
        nrm = nrm_pv[used].reshape(-1, 3)
        uv = uv_pv[used].reshape(-1, 2)
        nv = pos.shape[0]
        indices = np.arange(nv, dtype=np.int32)

        ln_norm = np.linalg.norm(nrm, axis=-1, keepdims=True)
        nrm = np.where(ln_norm > 1e-9, nrm / np.maximum(ln_norm, 1e-9), [[0.0, 1.0, 0.0]])

        # Tangent frame from UV derivatives would go here; default frame for now.
        tangents = np.zeros((nv, 3))
        tangents[:, 0] = 1.0
        bit = np.cross(nrm, tangents)
        bl = np.linalg.norm(bit, axis=-1, keepdims=True)
        bit = np.where(bl > 1e-6, bit / np.maximum(bl, 1e-9), [[0.0, 0.0, 1.0]])
        tangents = np.cross(bit, nrm)

        meshes.append(MeshData(
            positions=pos.astype(np.float32),
            normals=nrm.astype(np.float32),
            uvs=uv.astype(np.float32),
            tangents=tangents.astype(np.float32),
            bitangents=bit.astype(np.float32),
            indices=indices,
            material_idx=0,
        ))
    if not meshes:
        raise ValueError("no meshes found in FBX")
    return meshes
