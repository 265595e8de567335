"""Offline tooling: manifest packager + roughness fixup
(Tools/Packager and Scripts/Fix*RoughnessMaps.py analogs)."""

import json
import sys
import zipfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

import fix_roughness_maps as frm  # noqa: E402
import packager  # noqa: E402


def _make_tree(root: Path):
    (root / "src").mkdir(parents=True)
    (root / "src" / "a.py").write_text("a")
    (root / "src" / "skip").mkdir()
    (root / "src" / "skip" / "b.py").write_text("b")
    (root / "src" / "__pycache__").mkdir()
    (root / "src" / "__pycache__" / "c.pyc").write_text("c")
    (root / "top.md").write_text("t")
    (root / "Manifest.txt").write_text(
        "[Code]\nsrc/\n|src/skip/\n\n[Local]\ntop.md\nmissing.txt\n"
        "\n[References]\nsub\n")
    sub = root / "sub"
    sub.mkdir()
    (sub / "lib.py").write_text("lib")
    (sub / "Manifest.txt").write_text("[Code]\nlib.py\n")


def test_packager_collect_excludes_and_references(tmp_path):
    _make_tree(tmp_path)
    files = packager.collect_files(tmp_path / "Manifest.txt")
    rels = set(files)
    assert "src/a.py" in rels
    assert "top.md" in rels
    assert "lib.py" in rels              # via [References] sub/Manifest.txt
    assert "src/skip/b.py" not in rels   # |exclusion
    assert not any("__pycache__" in r for r in rels)


def test_packager_zip_and_dir_outputs(tmp_path):
    _make_tree(tmp_path)
    zp = tmp_path / "out" / "rel.zip"
    n = packager.package(tmp_path / "Manifest.txt", zp, name="t")
    assert n == 3
    with zipfile.ZipFile(zp) as z:
        names = set(z.namelist())
        assert {"src/a.py", "top.md", "lib.py", "package_info.json"} == names
        info = json.loads(z.read("package_info.json"))
        assert info["file_count"] == 3 and info["name"] == "t"

    dd = tmp_path / "out" / "reldir"
    packager.package(tmp_path / "Manifest.txt", dd)
    assert (dd / "src" / "a.py").read_text() == "a"
    assert (dd / "package_info.json").exists()


def test_repo_manifest_resolves(tmp_path):
    repo = Path(__file__).resolve().parents[1]
    files = packager.collect_files(repo / "Manifest.txt")
    rels = set(files)
    assert "bench.py" in rels
    assert "dxrpathtracer_tpu/render/integrator.py" in rels
    assert not any("__pycache__" in r for r in rels)
    assert len(rels) > 60


def test_roughness_conventions(tmp_path):
    from PIL import Image

    # Sponza style pair + SunTemple style pair + a gloss map to derive
    img = Image.fromarray(np.full((4, 4), 64, np.uint8))
    img.save(tmp_path / "Wall_diffuse.png")
    img.save(tmp_path / "Wall_roughness.png")
    img.save(tmp_path / "M_PillarSR.png")
    img.save(tmp_path / "M_PillarR.png")
    img.save(tmp_path / "Floor_diffuse.png")
    Image.fromarray(np.full((4, 4), 200, np.uint8)).save(
        tmp_path / "Floor_gloss.png")

    derived = frm.derive_from_gloss(tmp_path)
    assert [d.name for d in derived] == ["Floor_roughness.png"]
    out = np.asarray(Image.open(tmp_path / "Floor_roughness.png"))
    assert (out == 55).all()  # 255 - 200

    bindings = frm.build_bindings(tmp_path)
    assert bindings["Wall_diffuse.png"] == "Wall_roughness.png"
    assert bindings["M_PillarSR.png"] == "M_PillarR.png"
    assert bindings["Floor_diffuse.png"] == "Floor_roughness.png"

    rc = frm.main(["--dir", str(tmp_path), "--apply"])
    assert rc == 0
    data = json.loads((tmp_path / frm.BINDINGS_NAME).read_text())
    assert data == bindings
