"""Load-time alpha-triangle subdivision (scene/alphasplit.py).

The reference's any-hit alpha test runs per candidate hit in hardware
(RayTrace.hlsl:485-507); the TPU build pays a whole re-traversal per
rejected hit, so transparent geometry is culled at LOAD time instead.
These tests pin the two safety properties the optimization rests on:
the conservative classifier never misjudges a bilinear tap, and the
split scene produces the exact same accepted hits as the unsplit one.
"""

import dataclasses
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dxrpathtracer_tpu.scene.alphasplit import (_Classifier,
                                                split_alpha_meshes)
from dxrpathtracer_tpu.scene.build import build_scene
from dxrpathtracer_tpu.scene.procedural import make_plane
from dxrpathtracer_tpu.scene.registry import FOLIAGE_DDS
from dxrpathtracer_tpu.scene.textures import (AtlasBuilder,
                                              default_material_table)

_DDS = Path("/root/reference") / FOLIAGE_DDS


def _checker_mask(n=64, period=8):
    yy, xx = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    return (((yy // period + xx // period) % 2).astype(np.float32))[..., None]


def _mask():
    if _DDS.exists():
        from dxrpathtracer_tpu.scene.dds import load_dds
        return load_dds(_DDS).data
    return _checker_mask(256, 16)


def _alpha_card_inputs(mask):
    meshes = [make_plane((1.0, 1.0), (0.0, 1.0, 0.0), material_idx=1)]
    builder = AtlasBuilder()
    materials = default_material_table(2, builder)
    op = np.asarray(materials.opacity).copy()
    op[1] = builder.add("op", mask)
    ho = np.asarray(materials.has_opacity).copy()
    ho[1] = True
    materials = dataclasses.replace(materials, opacity=op, has_opacity=ho,
                                    any_opacity=True)
    return meshes, materials, builder


def test_classifier_matches_bruteforce():
    """classify() must agree with a brute-force min/max over the padded
    footprint for random sub-boxes, including wrap-around ones."""
    rng = np.random.RandomState(3)
    img = (rng.rand(48, 80, 1) > 0.5).astype(np.float32)
    cls = _Classifier(img, 0.35)
    h, w = img.shape[:2]
    ge = img[..., 0] >= 0.35
    for _ in range(300):
        base = rng.uniform(-0.5, 1.5, size=2)
        ext = rng.uniform(1e-3, 0.4, size=2)
        uvs = np.stack([base, base + [ext[0], 0], base + [0, ext[1]]])
        got = cls.classify(uvs.astype(np.float32))
        xs = uvs[:, 0] * w - 0.5
        ys = uvs[:, 1] * h - 0.5
        x0 = int(np.floor(xs.min())) - 1
        x1 = int(np.ceil(xs.max())) + 2
        y0 = int(np.floor(ys.min())) - 1
        y1 = int(np.ceil(ys.max())) + 2
        texels = ge[np.arange(y0, y1)[:, None] % h,
                    np.arange(x0, x1)[None, :] % w]
        want = ("opaque" if texels.all()
                else "transparent" if not texels.any() else "mixed")
        if x1 - x0 >= w or y1 - y0 >= h:
            # full-texture fallback is allowed to be more conservative
            full = ("opaque" if ge.all()
                    else "transparent" if not ge.any() else "mixed")
            assert cls.classify(uvs.astype(np.float32)) == full
            continue
        assert got == want, (uvs, got, want)


def test_extreme_masks():
    """All-opaque mask -> everything promoted to the opaque clone;
    all-transparent -> everything dropped."""
    for value, key in ((1.0, "opaque"), (0.0, "transparent")):
        mask = np.full((32, 32, 1), value, np.float32)
        meshes, materials, builder = _alpha_card_inputs(mask)
        out, mats, stats = split_alpha_meshes(meshes, materials, builder)
        if key == "opaque":
            assert stats == dict(dropped=0, opaque=2, mixed=0, source=2)
            # clone material appended, not alpha-tested
            assert len(np.asarray(mats.has_opacity)) == 3
            assert not np.asarray(mats.has_opacity)[2]
            card = [m for m in out if m.material_idx == 2]
            assert len(card) == 1
            # triangle soup exactly preserved (uniform cards aren't split);
            # output is unindexed, so compare canonicalized triangle sets
            def canon(mesh):
                tris = mesh.positions[mesh.indices.reshape(-1, 3)]
                tris = np.stack([t[np.lexsort(t.T[::-1])] for t in tris])
                flat = tris.reshape(-1, 9)
                return flat[np.lexsort(flat.T[::-1])]
            np.testing.assert_array_equal(canon(card[0]), canon(meshes[0]))
        else:
            assert stats["dropped"] == 2 and stats["mixed"] == 0
            assert all(m.material_idx != 1 for m in out)


def test_split_hits_identical_dense_grid():
    """The whole point: split and unsplit scenes accept the exact same
    hits under punch-through closest-hit traversal (VERDICT r3 #5)."""
    from dxrpathtracer_tpu.accel.lbvh import build_bvh_for_scene
    from dxrpathtracer_tpu.accel import traverse as tv
    from dxrpathtracer_tpu.app.settings import AppSettings
    from dxrpathtracer_tpu.render.integrator import (_make_alpha_test,
                                                     _punch_through_closest)

    mask = _mask()
    results = []
    for split in (False, True):
        meshes, materials, builder = _alpha_card_inputs(mask)
        if split:
            meshes, materials, stats = split_alpha_meshes(
                meshes, materials, builder, max_level=3)
            assert stats["dropped"] > 0  # the mask must exercise culling
        scene = build_scene(meshes, materials=materials,
                            atlas_builder=builder)
        sc = jax.device_put(scene)
        bvh = build_bvh_for_scene(sc,
                                  positions=np.asarray(scene.positions),
                                  tri_idx=np.asarray(scene.tri_idx))
        accept = _make_alpha_test(sc, AppSettings())

        n = 128
        u = np.linspace(-0.999, 0.999, n)
        xx, zz = np.meshgrid(u, u)
        o = np.stack([xx.ravel(), np.full(n * n, 5.0), zz.ravel()],
                     -1).astype(np.float32)
        d = np.tile(np.array([[0, -1, 0]], np.float32), (n * n, 1))

        def closest_fn(o_, d_, tn, tx, ac, _b=bvh):
            return tv.closest_hit(_b, o_, d_, tn, tx, ac)

        hit = _punch_through_closest(closest_fn, accept, jnp.asarray(o),
                                     jnp.asarray(d), 0.001, 100.0,
                                     jnp.ones((n * n,), bool))
        results.append((np.asarray(hit.t), np.asarray(hit.tri_id) >= 0))
    (t0, h0), (t1, h1) = results
    np.testing.assert_array_equal(h0, h1)
    np.testing.assert_array_equal(t0[h0], t1[h1])


def test_cache_key_includes_split_env(monkeypatch, tmp_path):
    from dxrpathtracer_tpu.scene.cache import scene_cache_key
    from dxrpathtracer_tpu.scene.registry import PRESETS
    from dxrpathtracer_tpu.app.settings import Scenes

    f = tmp_path / "x.fbx"
    f.write_bytes(b"not an fbx")
    preset = PRESETS[Scenes.Sponza]
    monkeypatch.delenv("DXRPT_ALPHA_SPLIT", raising=False)
    k0 = scene_cache_key(str(f), preset)
    monkeypatch.setenv("DXRPT_ALPHA_SPLIT", "1")
    k1 = scene_cache_key(str(f), preset)
    monkeypatch.setenv("DXRPT_ALPHA_SPLIT_LEVEL", "6")
    k2 = scene_cache_key(str(f), preset)
    assert len({k0, k1, k2}) == 3
