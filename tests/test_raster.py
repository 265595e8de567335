"""Forward (raster-mode) renderer, clusters, cascades tests."""

import numpy as np
import jax.numpy as jnp

from dxrpathtracer_tpu.app.settings import AppSettings, MSAAModes, Scenes
from dxrpathtracer_tpu.render.clusters import (build_cluster_masks,
                                               froxel_bounding_spheres,
                                               sphere_cone_intersection)
from dxrpathtracer_tpu.render.shadows import cascade_splits, prepare_cascades
from dxrpathtracer_tpu.scene.types import make_spot_lights


def test_sphere_cone_intersection_basics():
    tip = jnp.asarray([[0.0, 0.0, 0.0]])
    axis = jnp.asarray([[0.0, 0.0, 1.0]])
    height = jnp.asarray([10.0])
    angle = jnp.asarray([np.deg2rad(60.0)])
    centers = jnp.asarray([
        [0.0, 0.0, 5.0],    # on axis, inside
        [0.0, 0.0, -5.0],   # behind the tip
        [0.0, 0.0, 25.0],   # beyond the cap (radius 1)
        [8.0, 0.0, 5.0],    # far off to the side
        [3.2, 0.0, 5.0],    # near the cone surface (boundary ~2.89 + r)
    ])
    radii = jnp.asarray([1.0, 1.0, 1.0, 1.0, 1.0])
    hit = np.asarray(sphere_cone_intersection(tip, axis, height, angle,
                                              centers, radii))[:, 0]
    assert hit[0] and not hit[1] and not hit[2] and not hit[3] and hit[4]


def test_froxel_spheres_cover_frustum():
    from dxrpathtracer_tpu.render.camera import FirstPersonCamera
    cam = FirstPersonCamera(aspect=1.0)
    cam.set_position((0, 0, 0))
    spheres, (nx, ny, nz) = froxel_bounding_spheres(64, 64, cam)
    assert spheres.shape == (nx * ny * nz, 4)
    assert (spheres[:, 3] > 0).all()
    # A point straight ahead at mid depth must be inside some froxel sphere
    p = np.array([0.0, 0.0, 50.0])
    d = np.linalg.norm(spheres[:, :3] - p, axis=1)
    assert (d <= spheres[:, 3]).any()


def test_cluster_masks_select_correct_lights():
    from dxrpathtracer_tpu.render.camera import FirstPersonCamera
    cam = FirstPersonCamera(aspect=1.0)
    cam.set_position((0, 0, 0))
    lights = make_spot_lights(
        positions=[[0.0, 0.0, 5.0], [1000.0, 0.0, 5.0]],
        directions=[[0.0, -1.0, 0.0], [0.0, -1.0, 0.0]],
        intensities=[[1, 1, 1], [1, 1, 1]],
        angular_attenuation=[[0.5, 1.0], [0.5, 1.0]])
    spheres, dims = froxel_bounding_spheres(64, 64, cam)
    masks = np.asarray(build_cluster_masks(lights, jnp.asarray(spheres)))
    # Light 0 (in front of the camera) must land in some clusters
    assert (masks & 1).any()
    # Light 1 is 1000 units off to the side: no cluster within the frustum
    assert not (masks & 2).any()


def test_cascade_splits_monotone():
    s = cascade_splits()
    assert len(s) == 4
    assert s[-1] == 1.0 or abs(s[-1] - 1.0) < 1e-6
    assert (np.diff(s) > 0).all()


def test_prepare_cascades():
    from dxrpathtracer_tpu.render.camera import FirstPersonCamera
    cam = FirstPersonCamera()
    cam.set_position((0, 2, 0))
    sun = np.array([0.26, 0.987, -0.16])
    cascades = prepare_cascades(cam, sun)
    assert len(cascades) == 4
    radii = [c.radius for c in cascades]
    assert all(np.isfinite(radii)) and (np.diff(radii) > 0).all()
    # Cascade transform maps its own center near the light-space origin (xy)
    for c in cascades:
        h = np.append(c.center, 1.0) @ c.view_proj
        assert abs(h[0]) < 0.1 and abs(h[1]) < 0.1


def test_forward_render_boxtest():
    from dxrpathtracer_tpu.app.session import RenderSession
    sess = RenderSession(
        settings=AppSettings(current_scene=Scenes.BoxTest,
                             msaa_mode=MSAAModes.MSAANone),
        width=32, height=32)
    img = np.asarray(sess.render_raster_frame())
    assert img.shape == (32, 32, 3)
    assert np.isfinite(img).all()
    assert img.max() > 0.0  # sun-lit scene is not black
    # Sky pixels (top rows look above the horizon) roughly match cubemap scale
    assert img[0].mean() > 0.1


def test_forward_render_lightmap_mode():
    import jax
    from dxrpathtracer_tpu.app.session import RenderSession
    from dxrpathtracer_tpu.bake.baker import Baker

    sess = RenderSession(
        settings=AppSettings(current_scene=Scenes.BoxTest,
                             msaa_mode=MSAAModes.MSAANone,
                             enable_light_map_render=True,
                             sqrt_num_samples=2),
        width=24, height=24)
    baker = Baker(sess, resolution=64)
    for _ in range(4):
        baker.bake_step()
    lm = baker.lightmap()
    uvs = jnp.asarray(baker.atlas.triangle_uvs())
    img = np.asarray(sess.render_raster_frame(lightmap=lm, lightmap_uvs=uvs))
    assert np.isfinite(img).all()
    assert img.max() > 0.0


def test_pcf_shadow_mode_matches_rays():
    """PCF depth-map sun shadows vs exact shadow rays on BoxTest: the two
    backends must agree everywhere except the (penumbra-blurred) shadow edge
    (shadow_mode switch — MeshRenderer.cpp:534-565 + Shadows.hlsl:318-360)."""
    from dxrpathtracer_tpu.app.session import RenderSession
    sess = RenderSession(
        settings=AppSettings(current_scene=Scenes.BoxTest,
                             msaa_mode=MSAAModes.MSAANone),
        width=48, height=48)
    img_rays = np.asarray(sess.render_raster_frame(shadow_mode="rays"))
    img_pcf = np.asarray(sess.render_raster_frame(shadow_mode="pcf",
                                                  shadow_map_size=512))
    assert np.isfinite(img_pcf).all()
    diff = np.abs(img_rays - img_pcf).max(axis=-1)
    rel = diff / (np.abs(img_rays).max(axis=-1) + 1e-3)
    # Most pixels identical; a small fraction may straddle the filtered edge.
    assert (rel < 0.05).mean() > 0.95, f"PCF/rays mismatch: {(rel >= 0.05).mean():.3f}"
    # The box's shadow exists in both (PCF must actually occlude something)
    assert (img_pcf.max(-1) < 0.25 * img_pcf.max()).any()


def test_pcf_depth_maps_sane():
    from dxrpathtracer_tpu.app.session import RenderSession
    from dxrpathtracer_tpu.render.shadows import (prepare_cascades,
                                                  render_cascade_depth_maps)
    sess = RenderSession(
        settings=AppSettings(current_scene=Scenes.BoxTest), width=8, height=8)
    sun = np.asarray(sess.settings.sun_direction, np.float32)
    cascades = prepare_cascades(sess.camera, sun / np.linalg.norm(sun))
    maps = np.asarray(render_cascade_depth_maps(sess.bvh, cascades, 64))
    assert maps.shape == (4, 64, 64)
    assert np.isfinite(maps).all()
    assert maps.min() >= 0.0 and maps.max() <= 1.0 + 1e-6
    # The scene occupies part of every cascade: some hits, some misses
    assert (maps < 1.0).any() and (maps == 1.0).any()


def test_spot_pcf_matches_exact_rays():
    """Spot-light shadow depth maps + PCF vs the exact-ray backend
    (MeshRenderer.cpp:568-608 parity; VERDICT round-2 item 8): a spot above
    the BoxTest box must cast the same shadow through both paths."""
    import dataclasses as _dc

    import jax
    from dxrpathtracer_tpu.app.session import RenderSession
    from dxrpathtracer_tpu.scene.build import build_scene
    from dxrpathtracer_tpu.scene.procedural import box_test_meshes
    from dxrpathtracer_tpu.scene.types import make_spot_lights
    from dxrpathtracer_tpu.scene.registry import PRESETS

    lights = make_spot_lights(
        positions=[(1.5, 6.0, -1.5)],
        directions=[(0.0, -1.0, 0.0)],
        intensities=[(4000.0, 3800.0, 3500.0)],
        angular_attenuation=[(np.cos(np.deg2rad(20.0)),
                              np.cos(np.deg2rad(32.0)))],
        light_range=12.0,
    )
    scene = build_scene(box_test_meshes(), lights=lights)
    sess = RenderSession(
        settings=AppSettings(current_scene=Scenes.BoxTest,
                             msaa_mode=MSAAModes.MSAANone,
                             enable_sun=False, enable_sky=False),
        width=48, height=48, scene=scene, preset=PRESETS[Scenes.BoxTest])
    img_rays = np.asarray(sess.render_raster_frame(shadow_mode="rays"))
    img_pcf = np.asarray(sess.render_raster_frame(shadow_mode="pcf",
                                                  shadow_map_size=256))
    assert np.isfinite(img_pcf).all()
    # the spot lights the floor through both backends
    assert img_pcf.max() > 1.0 and img_rays.max() > 1.0
    diff = np.abs(img_rays - img_pcf).max(axis=-1)
    rel = diff / (np.abs(img_rays).max(axis=-1) + 1e-3)
    assert (rel < 0.07).mean() > 0.92, (
        f"spot PCF/rays mismatch: {(rel >= 0.07).mean():.3f}")
    # the box must shadow part of the spot's floor disc in the PCF image:
    # some pixels lit by the spot in neither image, some in both
    lit_rays = img_rays.max(-1) > 0.5 * img_rays.max()
    lit_pcf = img_pcf.max(-1) > 0.5 * img_pcf.max()
    assert (lit_rays == lit_pcf).mean() > 0.95


def test_cluster_rasterization_mode_accuracy_ladder():
    """ClusterRasterizationMode maps to the analytic binning's accuracy
    ladder: mode 0 tests the froxel center only (non-conservative raster
    analog), mode 3 the full bounding sphere (conservative). Every cluster
    lit at mode 0 must stay lit at mode 3, and the conservative mode must
    find at least as many partially-overlapped clusters."""
    from dxrpathtracer_tpu.render.camera import FirstPersonCamera
    cam = FirstPersonCamera(aspect=1.0)
    cam.set_position((0, 0, 0))
    lights = make_spot_lights(
        positions=[[0.0, 0.0, 5.0]],
        directions=[[0.0, -1.0, 0.0]],
        intensities=[[1, 1, 1]],
        angular_attenuation=[[0.5, 1.0]])
    spheres, _ = froxel_bounding_spheres(64, 64, cam)
    m0 = np.asarray(build_cluster_masks(lights, jnp.asarray(spheres), mode=0))
    m3 = np.asarray(build_cluster_masks(lights, jnp.asarray(spheres), mode=3))
    assert (m3 & m0 == m0).all()        # conservative is a superset
    assert (m3 != 0).sum() > (m0 != 0).sum()  # and strictly catches more


def test_msm_moment_roundtrip():
    """ConvertOptimizedMoments(GetOptimizedMoments(d)) must reproduce the
    raw power moments (d, d^2, d^3, d^4) — the MSM.hlsl basis pair is an
    exact inverse up to fp32 rounding."""
    import jax.numpy as jnp
    from dxrpathtracer_tpu.render.shadows import (_MSM_BIAS0, _MSM_DECODE,
                                                  convert_depth_maps)
    d = np.linspace(0.02, 0.98, 25, dtype=np.float32).reshape(1, 5, 5)
    opt = convert_depth_maps(d, "msm")
    raw = np.asarray(opt.at[..., 0].add(-_MSM_BIAS0) @ jnp.asarray(_MSM_DECODE))
    expect = np.stack([d, d**2, d**3, d**4], axis=-1)
    assert np.allclose(raw, expect, atol=2e-4), np.abs(raw - expect).max()


def test_evsm_chebyshev_flat_occluder():
    """A constant-depth occluder: receivers behind it are fully shadowed,
    receivers in front fully lit (one-tailed Chebyshev, EVSM.hlsl)."""
    import jax.numpy as jnp
    from dxrpathtracer_tpu.render.shadows import (chebyshev_upper_bound,
                                                  convert_depth_maps,
                                                  evsm_exponents, warp_depth)
    maps = convert_depth_maps(np.full((1, 8, 8), 0.5, np.float32), "evsm")
    m = np.asarray(maps)[0, 0, 0]
    exps = evsm_exponents()
    for depth, expect in ((0.3, 1.0), (0.7, 0.0)):
        wp, _wn = warp_depth(jnp.float32(depth), exps)
        vis = float(chebyshev_upper_bound(
            jnp.float32(m[0]), jnp.float32(m[2]), wp, jnp.float32(1e-6), 0.25))
        assert abs(vis - expect) < 1e-3, (depth, vis)


def test_evsm_msm_shadow_modes_match_rays():
    """EVSM and MSM moment shadow maps vs exact rays on BoxTest — the
    ShadowMapMode::EVSM/::MSM paths (ShadowHelper.h:25-108, SMConvert.hlsl,
    Shadows.hlsl:88-160). Filterable representations blur the penumbra, so
    the agreement bar is slightly looser than PCF's."""
    from dxrpathtracer_tpu.app.session import RenderSession
    sess = RenderSession(
        settings=AppSettings(current_scene=Scenes.BoxTest,
                             msaa_mode=MSAAModes.MSAANone),
        width=48, height=48)
    img_rays = np.asarray(sess.render_raster_frame(shadow_mode="rays"))
    for mode in ("evsm", "msm"):
        img = np.asarray(sess.render_raster_frame(shadow_mode=mode,
                                                  shadow_map_size=512))
        assert np.isfinite(img).all(), mode
        diff = np.abs(img_rays - img).max(axis=-1)
        rel = diff / (np.abs(img_rays).max(axis=-1) + 1e-3)
        frac = (rel < 0.05).mean()
        assert frac > 0.92, f"{mode}/rays mismatch: {1 - frac:.3f}"
        # the box still casts a shadow through the moment representation
        assert (img.max(-1) < 0.25 * img.max()).any(), mode
