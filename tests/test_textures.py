"""Texel-pool texture system tests: native-resolution storage, bilinear
wrap-addressed sampling vs a numpy oracle, dedup, and the resolution cap.

Filtering parity target: HLSL `SampleLevel(MeshSampler, uv, 0.0f)` with a
linear wrap sampler (RayTrace.hlsl:174,185) — D3D texel-center convention."""

import numpy as np
import jax.numpy as jnp

from dxrpathtracer_tpu.scene.textures import AtlasBuilder, sample_bilinear_wrap


def _oracle_bilinear_wrap(img, uv):
    """Reference bilinear-wrap sampler, scalar numpy."""
    h, w = img.shape[:2]
    x = uv[0] * w - 0.5
    y = uv[1] * h - 0.5
    x0, y0 = int(np.floor(x)), int(np.floor(y))
    fx, fy = x - x0, y - y0
    t = lambda yy, xx: img[yy % h, xx % w]
    top = t(y0, x0) * (1 - fx) + t(y0, x0 + 1) * fx
    bot = t(y0 + 1, x0) * (1 - fx) + t(y0 + 1, x0 + 1) * fx
    return top * (1 - fy) + bot * fy


def _build_mixed_pool(seed=0):
    rng = np.random.default_rng(seed)
    b = AtlasBuilder()
    sizes = [(1, 1), (4, 4), (7, 3), (16, 16), (5, 9)]  # (h, w) incl. non-pow2
    imgs, idxs = [], []
    for i, (h, w) in enumerate(sizes):
        img = rng.random((h, w, 4)).astype(np.float32)
        idxs.append(b.add(f"tex{i}", img))
        imgs.append(img)
    return b.build(), imgs, idxs


def test_native_resolution_preserved():
    atlas, imgs, idxs = _build_mixed_pool()
    meta = np.asarray(atlas.meta)
    texels = np.asarray(atlas.texels)
    for img, idx in zip(imgs, idxs):
        base, w, h = meta[idx]
        assert (h, w) == img.shape[:2]
        np.testing.assert_array_equal(
            texels[base:base + h * w].reshape(h, w, 4), img)


def test_bilinear_wrap_matches_oracle():
    atlas, imgs, idxs = _build_mixed_pool(seed=3)
    rng = np.random.default_rng(11)
    n = 256
    tex_sel = rng.integers(0, len(idxs), n)
    # UVs outside [0,1) exercise wrap addressing (negative too)
    uvs = rng.uniform(-2.0, 3.0, (n, 2)).astype(np.float32)
    tex_idx = jnp.asarray([idxs[t] for t in tex_sel], jnp.int32)
    out = np.asarray(sample_bilinear_wrap(atlas, tex_idx, jnp.asarray(uvs)))
    expect = np.stack([_oracle_bilinear_wrap(imgs[t], uv)
                       for t, uv in zip(tex_sel, uvs)])
    np.testing.assert_allclose(out, expect, rtol=1e-5, atol=1e-5)


def test_dedup_by_name():
    b = AtlasBuilder()
    a1 = b.add("same", np.ones((2, 2, 4), np.float32))
    a2 = b.add("same", np.zeros((8, 8, 4), np.float32))
    assert a1 == a2


def test_resolution_cap_box_filters():
    b = AtlasBuilder(max_resolution=4)
    img = np.zeros((8, 8, 4), np.float32)
    img[0::2, 0::2] = 1.0  # checker: every 2x2 box averages to 0.25
    idx = b.add("big", img)
    atlas = b.build()
    base, w, h = np.asarray(atlas.meta)[idx]
    assert (w, h) == (4, 4)
    np.testing.assert_allclose(
        np.asarray(atlas.texels)[base:base + 16], 0.25)


def test_single_channel_expands_rgb():
    b = AtlasBuilder()
    idx = b.add("mono", np.full((2, 2), 0.5, np.float32))
    atlas = b.build()
    base, w, h = np.asarray(atlas.meta)[idx]
    tx = np.asarray(atlas.texels)[base]
    np.testing.assert_allclose(tx, [0.5, 0.5, 0.5, 1.0])
