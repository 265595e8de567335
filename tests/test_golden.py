"""Golden-image regression tests (SURVEY.md §4(c): tiny-resolution goldens on
the CPU backend — our equivalent of the reference's WARP software-raytracing
configuration)."""

from pathlib import Path

import numpy as np

from dxrpathtracer_tpu.app.session import RenderSession
from dxrpathtracer_tpu.app.settings import AppSettings, Scenes

GOLDEN = Path(__file__).parent / "golden_boxtest_32.npy"


def test_boxtest_golden_image():
    """Full-pipeline pin: scene build + BVH + integrator + sky + accumulation.
    Any semantic change to CMJ, traversal, BRDF, sun/sky constants, or the
    camera shows up here."""
    sess = RenderSession(
        settings=AppSettings(current_scene=Scenes.BoxTest, sqrt_num_samples=2),
        width=32, height=32)
    img = np.asarray(sess.render_to_completion())
    golden = np.load(GOLDEN)
    assert img.shape == golden.shape
    # CPU-deterministic modulo fusion-order ULPs.
    rmse = float(np.sqrt(np.mean((img - golden) ** 2)))
    assert rmse < 1e-4, rmse


def test_white_furnace_fbx_scene():
    """The real WhiteFurnace.fbx sphere (19.8k tris) through the FBX importer:
    miss pixels are exactly 1.0 (furnace miss shader), sphere pixels finite and
    in the energy range the furnace's spec-only sampling produces."""
    sess = RenderSession(
        settings=AppSettings(current_scene=Scenes.WhiteFurnace, sqrt_num_samples=2),
        width=24, height=24)
    assert sess.scene_host.num_triangles == 19800  # from WhiteFurnace.fbx
    assert sess.settings.enable_white_furnace_mode  # forced by scene switch
    out = np.asarray(sess.render_to_completion())
    assert np.isfinite(out).all()
    assert np.allclose(out[0, 0], 1.0)  # background
    sphere = out[np.abs(out - 1.0).sum(-1) > 1e-3]
    assert sphere.size > 0
    assert 0.1 < sphere.mean() < 1.5
