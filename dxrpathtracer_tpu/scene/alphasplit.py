"""Host-side conservative alpha-triangle subdivision.

The reference pays +12% for alpha testing because its any-hit shader runs
in hardware per candidate hit (Timing.txt:6-8); the TPU punch-through
restores sparse evaluation but each REJECTED hit still forces a
re-traversal round, leaving a ~2.5x alpha premium (PERF_NOTES round-3).
This module attacks the premium where a TPU framework is strong: at LOAD
TIME on the host (VERDICT round-3 #5, realized as geometry preprocessing
instead of runtime block-mip taps).

Every triangle of an opacity-mapped material is subdivided adaptively
(midpoint 4-way, recursing only into MIXED regions), and each sub-triangle
is classified against the opacity texture with a conservative summed-area
count over its padded UV bbox:

  max opacity < 0.35 over the footprint  ->  DROPPED (a ray through it can
       never produce an accepted hit: every bilinear tap is a convex
       combination of texels below the threshold — the exact rejection the
       punch-through loop would have paid a whole re-traversal for);
  min opacity >= 0.35                    ->  reassigned to an OPAQUE clone
       of the material (every tap accepts: the FORCE_OPAQUE hit group);
  otherwise                              ->  kept alpha-tested.

Geometry is exactly preserved (sub-triangles tile the parent plane;
midpoint vertex attributes are the parent's linear lerp, so shading at any
surface point is unchanged up to fp association). The padded-bbox
classification is conservative under bilinear sampling AND UV wrap.
"""

import dataclasses

import numpy as np


def _integral_ge(img, threshold):
    """Summed-area table of (opacity >= threshold) for O(1) rect counts."""
    b = (img >= threshold).astype(np.int64)
    sat = np.zeros((b.shape[0] + 1, b.shape[1] + 1), np.int64)
    np.cumsum(np.cumsum(b, axis=0), axis=1, out=sat[1:, 1:])
    return sat


def _rect_count(sat, y0, y1, x0, x1):
    return (sat[y1, x1] - sat[y0, x1] - sat[y1, x0] + sat[y0, x0])


class _Classifier:
    """Conservative min/max-opacity classifier over UV bboxes (wrap-aware,
    +1-texel pad for the bilinear footprint)."""

    def __init__(self, opacity_img, threshold):
        self.h, self.w = opacity_img.shape[:2]
        self.sat = _integral_ge(opacity_img[..., 0], threshold)

    def classify(self, uvs):
        """uvs: (3, 2) sub-triangle corner UVs. Returns 'transparent',
        'opaque', or 'mixed'."""
        w, h = self.w, self.h
        # continuous texel coords of the bilinear footprint, +-1 texel pad
        xs = uvs[:, 0] * w - 0.5
        ys = uvs[:, 1] * h - 0.5
        x0 = int(np.floor(xs.min())) - 1
        x1 = int(np.ceil(xs.max())) + 2
        y0 = int(np.floor(ys.min())) - 1
        y1 = int(np.ceil(ys.max())) + 2
        if x1 - x0 >= w or y1 - y0 >= h:
            area = w * h
            cnt = _rect_count(self.sat, 0, h, 0, w)
        else:
            # wrap: split the rect into at most 4 in-range pieces
            area = cnt = 0
            xa = x0 % w
            ya = y0 % h
            xw = x1 - x0
            yh = y1 - y0
            for (yy0, yy1) in (((ya, min(ya + yh, h))),
                               ((0, max(0, ya + yh - h)))):
                for (xx0, xx1) in (((xa, min(xa + xw, w))),
                                   ((0, max(0, xa + xw - w)))):
                    if yy1 <= yy0 or xx1 <= xx0:
                        continue
                    area += (yy1 - yy0) * (xx1 - xx0)
                    cnt += _rect_count(self.sat, yy0, yy1, xx0, xx1)
        if cnt == 0:
            return "transparent"
        if cnt == area:
            return "opaque"
        return "mixed"


def _subdivide(attr3, cls, level, max_level, out):
    """Adaptive 4-way midpoint subdivision; attr3 is a dict of (3, ...)
    per-corner attribute arrays. Appends (kind, attr3) leaves to out."""
    kind = cls.classify(attr3["uvs"])
    if kind != "mixed" or level >= max_level:
        out.append((kind, attr3))
        return
    mids = {k: (v[[0, 1, 2]] + v[[1, 2, 0]]) * 0.5 for k, v in attr3.items()}
    corners = [(0, "m01", "m20"), ("m01", 1, "m12"), ("m20", "m12", 2),
               ("m01", "m12", "m20")]
    name_of = {"m01": 0, "m12": 1, "m20": 2}
    for tri in corners:
        sub = {}
        for k, v in attr3.items():
            rows = [v[c] if isinstance(c, int) else mids[k][name_of[c]]
                    for c in tri]
            sub[k] = np.stack(rows, axis=0)
        _subdivide(sub, cls, level + 1, max_level, out)


def split_alpha_meshes(meshes, materials, builder, threshold=0.35,
                       max_level=4):
    """Subdivide/classify every alpha-material mesh. Returns
    (new_meshes, new_materials, stats): dropped sub-triangles are gone,
    definite sub-triangles moved to an opaque material clone, mixed ones
    keep the alpha material. Opaque clones are appended to the material
    table (same texture slots, has_opacity=False)."""
    from .procedural import MeshData

    has_op = np.asarray(materials.has_opacity)
    if not has_op.any():
        return meshes, materials

    slots = ("albedo", "normal", "roughness", "metallic", "opacity",
             "emissive")
    slot_arrays = {s: list(np.asarray(getattr(materials, s))) for s in slots}
    has_list = list(has_op)
    opaque_clone = {}

    def clone_of(mat_idx):
        if mat_idx not in opaque_clone:
            for s in slots:
                slot_arrays[s].append(slot_arrays[s][mat_idx])
            has_list.append(False)
            opaque_clone[mat_idx] = len(has_list) - 1
        return opaque_clone[mat_idx]

    classifiers = {}

    def classifier_for(mat_idx):
        if mat_idx not in classifiers:
            tex_idx = int(np.asarray(materials.opacity)[mat_idx])
            img = builder._cap(builder._textures[tex_idx].data)
            classifiers[mat_idx] = _Classifier(img, threshold)
        return classifiers[mat_idx]

    out_meshes = []
    stats = dict(dropped=0, opaque=0, mixed=0, source=0)
    for mesh in meshes:
        if not has_list[mesh.material_idx]:
            out_meshes.append(mesh)
            continue
        cls = classifier_for(mesh.material_idx)
        idx = np.asarray(mesh.indices, np.int64).reshape(-1, 3)
        stats["source"] += len(idx)
        leaves = {"opaque": [], "mixed": []}
        for tri in idx:
            attr3 = dict(
                positions=mesh.positions[tri],
                normals=mesh.normals[tri],
                uvs=mesh.uvs[tri],
                tangents=mesh.tangents[tri],
                bitangents=mesh.bitangents[tri])
            pieces = []
            _subdivide(attr3, cls, 0, max_level, pieces)
            for kind, a in pieces:
                if kind == "transparent":
                    stats["dropped"] += 1
                else:
                    leaves[kind if kind == "opaque" else "mixed"].append(a)
        for kind, tris in leaves.items():
            if not tris:
                continue
            stats[kind] += len(tris)
            mat = (clone_of(mesh.material_idx) if kind == "opaque"
                   else mesh.material_idx)
            out_meshes.append(MeshData(
                positions=np.concatenate(
                    [a["positions"] for a in tris]).astype(np.float32),
                normals=np.concatenate(
                    [a["normals"] for a in tris]).astype(np.float32),
                uvs=np.concatenate(
                    [a["uvs"] for a in tris]).astype(np.float32),
                tangents=np.concatenate(
                    [a["tangents"] for a in tris]).astype(np.float32),
                bitangents=np.concatenate(
                    [a["bitangents"] for a in tris]).astype(np.float32),
                indices=np.arange(3 * len(tris), dtype=np.int32),
                material_idx=mat))

    new_materials = dataclasses.replace(
        materials,
        **{s: np.asarray(slot_arrays[s]) for s in slots},
        has_opacity=np.asarray(has_list, bool),
        any_opacity=bool(np.asarray(has_list).any()))
    return out_meshes, new_materials, stats


def maybe_split_alpha(meshes, materials, builder, threshold=0.35,
                      max_level=None):
    """Env-gated entry used by the scene registry. DEFAULT OFF: the
    interleaved device A/B (tools/ab_alphasplit.py, 2026-08-20) measured
    SponzaAlpha@540p at 883 ms unsplit vs 1114 ms at level 4 vs 1676 ms at
    level 6 — the subdivided foliage grows the BVH (36.8k -> 59k/279k rows)
    faster than the dropped punch-through rounds pay back, because internal
    rows dominate rows/ray on these topologies (PERF_NOTES round-4
    fat-record simulation found the same shape). Kept as an opt-in
    (DXRPT_ALPHA_SPLIT=1 [+ DXRPT_ALPHA_SPLIT_LEVEL]) and canary candidate:
    hit-parity is test-pinned, so a future stack where gathers get cheaper
    relative to rounds can re-measure in one env flip."""
    import logging
    import os

    if os.environ.get("DXRPT_ALPHA_SPLIT") != "1":
        return meshes, materials
    if max_level is None:
        max_level = int(os.environ.get("DXRPT_ALPHA_SPLIT_LEVEL", "4"))
    out_meshes, out_materials, stats = split_alpha_meshes(
        meshes, materials, builder, threshold=threshold, max_level=max_level)
    logging.getLogger("dxrpathtracer_tpu.scene").info(
        "alpha split: %d source tris -> %d opaque + %d mixed "
        "(%d transparent dropped)", stats["source"], stats["opaque"],
        stats["mixed"], stats["dropped"])
    return out_meshes, out_materials
