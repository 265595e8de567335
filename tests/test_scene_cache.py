"""Scene binary cache (scene/cache.py) — the Serialization.h /
Model::CreateFromMeshData analog (Model.cpp:724)."""

from pathlib import Path

import numpy as np
import pytest

from dxrpathtracer_tpu.app.settings import Scenes


def _leaves_equal(a, b):
    import jax

    l1, t1 = jax.tree_util.tree_flatten(a)
    l2, t2 = jax.tree_util.tree_flatten(b)
    assert t1 == t2
    for x, y in zip(l1, l2):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_pytree_roundtrip_bit_identical(tmp_path):
    from dxrpathtracer_tpu.scene.build import build_scene
    from dxrpathtracer_tpu.scene.cache import load_pytree, save_pytree
    from dxrpathtracer_tpu.scene.procedural import box_test_meshes

    scene = build_scene(box_test_meshes())
    p = tmp_path / "scene.npz"
    save_pytree(str(p), scene)
    back = load_pytree(str(p))
    assert type(back) is type(scene)
    assert back.materials.any_opacity == scene.materials.any_opacity
    assert back.textures.num_textures == scene.textures.num_textures
    _leaves_equal(scene, back)


def test_fbx_cache_hit_matches_fresh_parse(tmp_path, monkeypatch):
    from dxrpathtracer_tpu.scene import registry

    preset = registry.PRESETS[Scenes.WhiteFurnace]
    if not (Path("/root/reference") / preset.fbx_path).exists():
        pytest.skip("reference FBX not mounted")
    monkeypatch.setenv("DXRPT_SCENE_CACHE", str(tmp_path))

    fresh, _ = registry.load_scene(Scenes.WhiteFurnace)   # parse + store
    entries = list(tmp_path.glob("*.npz"))
    assert len(entries) == 1, "expected one cache entry after first load"
    cached, _ = registry.load_scene(Scenes.WhiteFurnace)  # cache hit
    _leaves_equal(fresh, cached)


def test_corrupt_cache_entry_falls_back_to_parser(tmp_path, monkeypatch,
                                                  caplog):
    import logging

    from dxrpathtracer_tpu.scene import registry

    preset = registry.PRESETS[Scenes.WhiteFurnace]
    if not (Path("/root/reference") / preset.fbx_path).exists():
        pytest.skip("reference FBX not mounted")
    monkeypatch.setenv("DXRPT_SCENE_CACHE", str(tmp_path))

    fresh, _ = registry.load_scene(Scenes.WhiteFurnace)
    (entry,) = tmp_path.glob("*.npz")
    entry.write_bytes(b"not an npz at all")
    with caplog.at_level(logging.WARNING,
                         logger="dxrpathtracer_tpu.scene.cache"):
        again, _ = registry.load_scene(Scenes.WhiteFurnace)
    assert any("unreadable" in r.message for r in caplog.records)
    _leaves_equal(fresh, again)


def test_loader_version_invalidates(tmp_path, monkeypatch):
    from dxrpathtracer_tpu.scene import cache, registry

    preset = registry.PRESETS[Scenes.WhiteFurnace]
    if not (Path("/root/reference") / preset.fbx_path).exists():
        pytest.skip("reference FBX not mounted")
    monkeypatch.setenv("DXRPT_SCENE_CACHE", str(tmp_path))
    registry.load_scene(Scenes.WhiteFurnace)
    assert len(list(tmp_path.glob("*.npz"))) == 1
    monkeypatch.setattr(cache, "LOADER_VERSION", cache.LOADER_VERSION + 1)
    registry.load_scene(Scenes.WhiteFurnace)  # miss under the new version
    assert len(list(tmp_path.glob("*.npz"))) == 2
