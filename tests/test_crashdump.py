"""Crash-dump capture (app/crashdump.py) — the Nsight Aftermath analog:
the reference writes DXRPathTracer_Crash.nv-gpudmp + shader logs on device
loss (DXRPathTracer.cpp:60-80); we persist a JSON reproduction bundle."""

import json

import pytest

from dxrpathtracer_tpu.app.crashdump import (build_crash_report, crash_guard,
                                             current_session)
from dxrpathtracer_tpu.app.session import RenderSession
from dxrpathtracer_tpu.app.settings import AppSettings, Scenes


def _session():
    s = AppSettings(current_scene=Scenes.BoxTest, sqrt_num_samples=1)
    return RenderSession(settings=s, width=16, height=16)


def test_crash_guard_writes_dump_and_reraises(tmp_path):
    sess = _session()
    path = tmp_path / "crash.json"
    with pytest.raises(RuntimeError, match="simulated device fault"):
        with crash_guard(sess, path=str(path)):
            raise RuntimeError("simulated device fault (UNAVAILABLE)")

    report = json.loads(path.read_text())
    assert "simulated device fault" in report["exception"]
    assert report["frame"]["width"] == 16
    assert report["frame"]["scene"] == "BoxTest"
    assert report["scene_tables"]["num_triangles"] > 0
    assert report["settings"]["max_path_length"] == "3"
    assert any("RuntimeError" in ln for ln in report["traceback"])


def test_session_registry_backs_the_cli_guard(tmp_path):
    sess = _session()  # __init__ registers itself
    assert current_session() is sess
    report = build_crash_report(ValueError("boom"))  # no explicit session
    # the CLI-level guard passes current_session(); emulate that contract
    report2 = build_crash_report(ValueError("boom"), current_session())
    assert "frame" not in report
    assert report2["frame"]["height"] == 16


def test_keyboard_interrupt_not_dumped(tmp_path):
    path = tmp_path / "crash.json"
    with pytest.raises(KeyboardInterrupt):
        with crash_guard(None, path=str(path)):
            raise KeyboardInterrupt()
    assert not path.exists()
