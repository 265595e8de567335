"""Lightmap UV atlas, surface maps, bake pipeline, denoisers."""

import numpy as np
import jax.numpy as jnp

from dxrpathtracer_tpu.bake.lightmap_uv import build_lightmap_atlas, texel_to_triangle
from dxrpathtracer_tpu.bake.surface_map import build_surface_maps
from dxrpathtracer_tpu.render.denoise import atrous_denoise, median_filter_3x3
from dxrpathtracer_tpu.scene.registry import load_scene
from dxrpathtracer_tpu.app.settings import Scenes


def test_atlas_no_overlap_and_coverage():
    atlas = build_lightmap_atlas(24)
    uvs = atlas.triangle_uvs()
    assert uvs.shape == (24, 3, 2)
    assert (uvs >= 0).all() and (uvs <= 1).all()
    tri, bu, bv = texel_to_triangle(atlas, 128)
    # Every triangle owns some texels at a reasonable resolution
    owned = set(np.unique(tri[tri >= 0]).tolist())
    assert owned == set(range(24))
    # Barycentrics valid
    m = tri >= 0
    assert (bu[m] >= 0).all() and (bv[m] >= 0).all()
    assert (bu[m] + bv[m] <= 1.0 + 1e-5).all()


def test_atlas_inverse_matches_forward():
    """texel -> (tri, bary) -> lightmap UV must land back on the texel."""
    atlas = build_lightmap_atlas(24)
    uvs = atlas.triangle_uvs().astype(np.float64)  # (T, 3, 2)
    s = 256
    tri, bu, bv = texel_to_triangle(atlas, s)
    ts = (np.arange(s) + 0.5) / s
    v, u = np.meshgrid(ts, ts, indexing="ij")
    m = tri >= 0
    t = tri[m]
    w = 1.0 - bu[m] - bv[m]
    uv_fwd = (uvs[t, 0] * w[:, None] + uvs[t, 1] * bu[m][:, None]
              + uvs[t, 2] * bv[m][:, None])
    assert np.allclose(uv_fwd[:, 0], u[m], atol=1e-5)
    assert np.allclose(uv_fwd[:, 1], v[m], atol=1e-5)


def test_surface_maps_boxtest():
    scene, _ = load_scene(Scenes.BoxTest)
    atlas = build_lightmap_atlas(scene.num_triangles)
    maps = build_surface_maps(scene, atlas, 64)
    pos = np.asarray(maps["position"])
    nrm = np.asarray(maps["normal"])
    cov = pos[..., 3]
    assert 0.2 < cov.mean() <= 1.0
    # Covered texels: positions within the scene AABB, unit normals
    m = cov > 0
    p = pos[m][:, :3]
    assert (np.abs(p[:, 0]) <= 5.0 + 1e-4).all()
    assert (p[:, 1] >= -0.126).all() and (p[:, 1] <= 2.501).all()
    nl = np.linalg.norm(nrm[m], axis=-1)
    assert np.allclose(nl, 1.0, atol=1e-4)


def test_median_filter_removes_impulse():
    img = np.full((16, 16, 3), 0.5, np.float32)
    img[8, 8] = 100.0  # firefly
    out = np.asarray(median_filter_3x3(jnp.asarray(img)))
    assert np.allclose(out, 0.5, atol=1e-6)


def test_median_filter_preserves_constant_and_edges():
    img = np.zeros((8, 8, 3), np.float32)
    img[:, 4:] = 1.0  # vertical edge
    out = np.asarray(median_filter_3x3(jnp.asarray(img)))
    # Median of a half-plane edge preserves the edge exactly
    assert np.array_equal(out, img)


def test_atrous_smooths_noise():
    rng = np.random.default_rng(0)
    img = (0.5 + 0.3 * rng.standard_normal((32, 32, 3))).astype(np.float32)
    img = np.clip(img, 0, None)
    out = np.asarray(atrous_denoise(jnp.asarray(img), iterations=3))
    assert out.std() < img.std() * 0.5
    assert abs(out.mean() - img.mean()) < 0.05


def test_bake_energy_boxtest():
    """Bake the BoxTest slab under a uniform sky: the up-facing slab top's
    lightmap should converge near the sky radiance value (cosine-weighted
    hemisphere integral of a constant == the constant), modulated by box
    occlusion; texels under the box are darker."""
    import jax
    from dxrpathtracer_tpu.app.session import RenderSession
    from dxrpathtracer_tpu.app.settings import AppSettings
    from dxrpathtracer_tpu.bake.baker import Baker, lightmap_from_accum

    settings = AppSettings(current_scene=Scenes.BoxTest, sqrt_num_samples=4,
                           enable_sun=False, max_path_length=2)
    sess = RenderSession(settings=settings, width=8, height=8)
    sky_val = 3.0
    sess._sky_cube_dev = jnp.full((6, 8, 8, 3), sky_val, jnp.float32)

    baker = Baker(sess, resolution=64)
    for _ in range(12):
        baker.bake_step()
    lm = np.asarray(baker.lightmap())
    accum = np.asarray(baker.accum)
    cov = accum[..., 3] > 0
    assert cov.any()
    assert np.isfinite(lm).all()
    pos = np.asarray(baker.surface_maps["position"])
    nrm = np.asarray(baker.surface_maps["normal"])
    # Texels on the slab top (y ~= 0.125, normal up) away from the box shadow
    top = cov & (np.abs(pos[..., 1] - 0.125) < 1e-3) & (nrm[..., 1] > 0.99) \
        & (np.abs(pos[..., 0]) > 2.0)
    assert top.sum() > 10
    vals = lm[top]
    # The lightmap stores INCIDENT radiance (cosine-weighted hemisphere
    # estimate); surface albedo is applied at render time (Mesh.hlsl:155-162).
    # Under a uniform sky the unoccluded estimate equals the sky value.
    expect = sky_val
    assert abs(vals.mean() - expect) / expect < 0.12, (vals.mean(), expect)

    # median denoise runs on the lightmap
    dn = np.asarray(baker.denoised_lightmap("median"))
    assert np.isfinite(dn).all()


def test_bake_checkpoint_resume_bit_identical(tmp_path):
    """A bake checkpointed at sample 2 and resumed in a FRESH Baker must
    produce the same accumulation as an uninterrupted 4-sample bake: the
    CMJ sampler is indexed by the GLOBAL sample_index, so resume is exact
    (the reference's in-GPU stop/resume, DXRPathTracer.cpp:2225-2240, made
    durable — SURVEY.md §5.4)."""
    from dxrpathtracer_tpu.app.session import RenderSession
    from dxrpathtracer_tpu.app.settings import AppSettings
    from dxrpathtracer_tpu.bake.baker import Baker

    settings = AppSettings(current_scene=Scenes.BoxTest, sqrt_num_samples=4,
                           max_path_length=2)
    sess = RenderSession(settings=settings, width=8, height=8)

    straight = Baker(sess, resolution=32)
    for _ in range(4):
        straight.bake_step()
    want = np.asarray(straight.accum)

    first = Baker(sess, resolution=32)
    first.bake_step()
    first.bake_step()
    path = str(tmp_path / "bake_ckpt.npz")
    first.save_checkpoint(path)

    resumed = Baker(sess, resolution=32)
    resumed.load_checkpoint(path)
    assert resumed.sample_index == 2
    resumed.bake_step()
    resumed.bake_step()
    got = np.asarray(resumed.accum)
    np.testing.assert_array_equal(got, want)
