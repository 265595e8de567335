"""Crash-dump capture — the Nsight Aftermath analog (SURVEY.md §5.3).

The reference registers Aftermath callbacks that write
`DXRPathTracer_Crash.nv-gpudmp` plus shader debug logs when the GPU device
is lost (DXRPathTracer.cpp:60-80). On this platform the failure modes are
different — XLA compile errors, tunneled-device faults (UNAVAILABLE "kernel
fault"), host OOM — but the need is the same: when a dispatch dies, persist
everything needed to reproduce it before the process exits.

`crash_guard(session)` wraps a render/bake loop; on an unhandled exception it
writes `dxrpathtracer_crash.json` (exception + traceback, platform/device
inventory, jax/numpy versions, full settings, frame shapes, sample index,
BVH/scene table shapes, DXRPT_* env knobs) and re-raises. The dump is JSON so
the triage tooling is `cat`, not a proprietary debugger.
"""

from __future__ import annotations

import contextlib
import json
import os
import sys
import time
import traceback

DEFAULT_PATH = "dxrpathtracer_crash.json"

# Weak reference to the most recently constructed RenderSession (registered
# by RenderSession.__init__) so a guard installed at the CLI dispatch level
# can still capture frame/scene state without threading the object through.
_last_session = None


def register_session(session) -> None:
    import weakref
    global _last_session
    _last_session = weakref.ref(session)


def current_session():
    return _last_session() if _last_session is not None else None


def _device_inventory():
    try:
        import jax
        return {
            "backend": jax.default_backend(),
            "devices": [str(d) for d in jax.devices()],
            "jax_version": jax.__version__,
        }
    except Exception as e:  # device enumeration itself can be what died
        return {"error": f"device inventory failed: {e!r}"}


def build_crash_report(exc: BaseException, session=None) -> dict:
    import numpy as np

    report = {
        "kind": "dxrpathtracer_tpu crash dump (Aftermath analog)",
        "time_unix": time.time(),
        "exception": repr(exc),
        "traceback": traceback.format_exception(type(exc), exc,
                                                exc.__traceback__),
        "platform": _device_inventory(),
        "numpy_version": np.__version__,
        "env": {k: v for k, v in os.environ.items()
                if k.startswith(("DXRPT_", "JAX_", "XLA_"))},
        "argv": sys.argv,
    }
    if session is not None:
        try:
            s = session.settings
            report["settings"] = {f: repr(getattr(s, f))
                                  for f in s.__dataclass_fields__}
            report["frame"] = {
                "width": session.width,
                "height": session.height,
                "sample_idx": session.sample_idx,
                "scene": getattr(session.preset, "name", "?"),
                "slab_rows": session._slab_h,
            }
            report["scene_tables"] = {
                "num_triangles": int(session.scene_host.num_triangles),
                "bvh_rows": int(session.bvh.num_rows),
                "bvh_width": int(session.bvh.width),
            }
        except Exception as e:  # the session may be half-constructed
            report["session_capture_error"] = repr(e)
    return report


def write_crash_dump(exc: BaseException, session=None, path=None) -> str:
    path = path or os.environ.get("DXRPT_CRASH_DUMP", DEFAULT_PATH)
    report = build_crash_report(exc, session)
    with open(path, "w") as f:
        json.dump(report, f, indent=1, default=repr)
    print(f"# crash dump written to {path}", file=sys.stderr)
    return path


@contextlib.contextmanager
def crash_guard(session=None, path=None):
    """Wrap a render/bake loop; on an unhandled exception persist the dump
    and re-raise (the reference shows a message box and exits — App.cpp:78-82).
    KeyboardInterrupt passes through undumped (user intent, not a crash)."""
    try:
        yield
    except KeyboardInterrupt:
        raise
    except BaseException as exc:
        with contextlib.suppress(Exception):  # never mask the real error
            write_crash_dump(exc, session or current_session(), path)
        raise
