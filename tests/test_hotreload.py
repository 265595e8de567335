"""Shader hot reload (app/hotreload.py) — the analog of the reference's
file-watch shader pipeline (ShaderCompilation.cpp:416 + App.cpp:231-237)."""

import os
import sys
import textwrap
import time

import numpy as np

from dxrpathtracer_tpu.app.hotreload import ShaderWatcher, reload_order
from dxrpathtracer_tpu.app.session import RenderSession
from dxrpathtracer_tpu.app.settings import AppSettings, Scenes


def _write(path, src):
    path.write_text(textwrap.dedent(src))
    # mtime granularity on some filesystems is 1s; force a visible bump
    st = path.stat()
    os.utime(path, (st.st_atime, st.st_mtime + 2.0))


def _make_fake_pkg(tmp_path, monkeypatch):
    """A miniature package shaped like ours: core (leaf), render (imports
    core via `from ... import`), app (not watched)."""
    pkg = tmp_path / "fakeshaders"
    (pkg / "core").mkdir(parents=True)
    (pkg / "render").mkdir()
    (pkg / "app").mkdir()
    (pkg / "__init__.py").write_text("")
    (pkg / "core" / "__init__.py").write_text("")
    (pkg / "render" / "__init__.py").write_text("")
    (pkg / "app" / "__init__.py").write_text("")
    (pkg / "core" / "brdf.py").write_text("def f():\n    return 1\n")
    (pkg / "render" / "integrator.py").write_text(
        "from fakeshaders.core.brdf import f\n"
        "def g():\n    return f() + 10\n")
    (pkg / "app" / "host.py").write_text("HOST = True\n")
    monkeypatch.syspath_prepend(str(tmp_path))
    import importlib
    for m in ("fakeshaders", "fakeshaders.core", "fakeshaders.core.brdf",
              "fakeshaders.render", "fakeshaders.render.integrator",
              "fakeshaders.app", "fakeshaders.app.host"):
        importlib.import_module(m)
    return pkg


def test_watcher_detects_change_and_reloads_dependents(tmp_path, monkeypatch):
    pkg = _make_fake_pkg(tmp_path, monkeypatch)
    try:
        w = ShaderWatcher(root="fakeshaders",
                          subpackages=("core", "render"))
        assert w.poll() == []  # nothing changed yet

        # edit the leaf "shader"
        _write(pkg / "core" / "brdf.py", """
            def f():
                return 2
            """)
        changed = w.poll()
        assert changed == ["fakeshaders.core.brdf"]

        order = w.reload(changed)
        # the dependent that did `from core.brdf import f` reloads AFTER
        # its dependency, so its binding re-resolves to the new code
        assert order.index("fakeshaders.core.brdf") < order.index(
            "fakeshaders.render.integrator")
        from fakeshaders.render.integrator import g
        assert g() == 12

        # the unwatched "C++ side" is never reported
        _write(pkg / "app" / "host.py", "HOST = False\n")
        assert w.poll() == []
    finally:
        for name in [n for n in sys.modules if n.startswith("fakeshaders")]:
            del sys.modules[name]


def test_reload_order_is_dependency_first_for_real_package():
    order = reload_order(["dxrpathtracer_tpu.core.brdf"], "dxrpathtracer_tpu")
    assert "dxrpathtracer_tpu.core.brdf" in order
    assert "dxrpathtracer_tpu.render.integrator" in order
    assert order.index("dxrpathtracer_tpu.core.brdf") < order.index(
        "dxrpathtracer_tpu.render.integrator")


def test_session_rebuild_step_after_real_reload():
    """Reloading the real integrator (unchanged source) + rebuild_step must
    leave rendering working and deterministic — the end-to-end PSO-re-create
    path minus the source edit (tests must not mutate the repo)."""
    s = AppSettings(current_scene=Scenes.BoxTest, sqrt_num_samples=2)
    sess = RenderSession(settings=s, width=16, height=16)
    ref = np.asarray(sess.render_to_completion())

    w = ShaderWatcher()
    reloaded = w.reload(["dxrpathtracer_tpu.render.integrator"])
    assert "dxrpathtracer_tpu.render.integrator" in reloaded
    sess.rebuild_step()
    assert sess.sample_idx == 0  # reload restarts the progressive render
    out = np.asarray(sess.render_to_completion())
    assert np.allclose(out, ref, atol=1e-6)


def test_interactive_check_hot_reload_noop(monkeypatch):
    from dxrpathtracer_tpu.app.interactive import InteractiveApp
    app = InteractiveApp(settings=AppSettings(current_scene=Scenes.BoxTest,
                                              sqrt_num_samples=1),
                         width=16, height=16, display=False)
    assert app.check_hot_reload(now=time.monotonic() + 2.0) == []
    assert app.reload_notice == ""
