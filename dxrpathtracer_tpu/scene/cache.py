"""Scene binary cache — the Model::CreateFromMeshData / Serialization.h analog.

The reference can serialize an imported model to a binary cache and reload
it without re-running Assimp (SampleFramework12 Serialization.h;
Model::CreateFromMeshData, Model.cpp:724). Here the imported "model" is a
Scene pytree of numpy arrays, so the cache is a single compressed .npz:
array leaves under dotted field paths plus a JSON structure header that
names each dataclass node, rebuilt by importlib on load.

Cache entries are keyed by a content hash of the source FBX bytes, the
preset fields, and a loader version constant — any change to the importer
or the asset invalidates the entry (the same keying discipline as the
reference's shader cache, ShaderCompilation.cpp:42-60, and our XLA
persistent cache in __init__.py). Loading is strictly best-effort: any
mismatch or corruption falls back to the real parser with a warning.
"""

import dataclasses
import hashlib
import importlib
import io
import json
import logging
import os
import tempfile

import numpy as np

log = logging.getLogger("dxrpathtracer_tpu.scene.cache")

# Bump when the importer's output format changes (fields, packing, parity
# fixes) — stale entries must not survive a loader change.
LOADER_VERSION = 4


# ---------------------------------------------------------------------------
# Generic pytree-of-dataclasses (de)serialization


def _is_array(x):
    return isinstance(x, np.ndarray) or type(x).__module__.startswith("jax")


def flatten_pytree(obj, prefix=""):
    """Returns (arrays: {path: np.ndarray}, spec) for a nested dataclass
    tree with numpy/jax array and plain-python leaves."""
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        cls = type(obj)
        children = {}
        for f in dataclasses.fields(obj):
            path = f"{prefix}{f.name}" if not prefix else f"{prefix}.{f.name}"
            children[f.name] = flatten_pytree(getattr(obj, f.name), path)
        arrays = {}
        spec_fields = {}
        for name, (a, s) in children.items():
            arrays.update(a)
            spec_fields[name] = s
        spec = {"kind": "dataclass",
                "class": f"{cls.__module__}:{cls.__qualname__}",
                "fields": spec_fields}
        return arrays, spec
    if _is_array(obj):
        path = prefix or "_root"
        return {path: np.asarray(obj)}, {"kind": "array", "path": path}
    if isinstance(obj, (tuple, list)):
        arrays = {}
        items = []
        for i, v in enumerate(obj):
            a, s = flatten_pytree(v, f"{prefix}[{i}]")
            arrays.update(a)
            items.append(s)
        return arrays, {"kind": "tuple" if isinstance(obj, tuple) else "list",
                        "items": items}
    if obj is None or isinstance(obj, (bool, int, float, str)):
        return {}, {"kind": "value", "value": obj}
    raise TypeError(f"unsupported leaf type {type(obj)!r} at {prefix!r}")


def unflatten_pytree(arrays, spec):
    kind = spec["kind"]
    if kind == "dataclass":
        mod, qual = spec["class"].split(":")
        cls = importlib.import_module(mod)
        for part in qual.split("."):
            cls = getattr(cls, part)
        kwargs = {name: unflatten_pytree(arrays, s)
                  for name, s in spec["fields"].items()}
        return cls(**kwargs)
    if kind == "array":
        return arrays[spec["path"]]
    if kind in ("tuple", "list"):
        seq = [unflatten_pytree(arrays, s) for s in spec["items"]]
        return tuple(seq) if kind == "tuple" else seq
    if kind == "value":
        return spec["value"]
    raise ValueError(f"bad spec kind {kind!r}")


def save_pytree(path: str, obj) -> None:
    """Atomic write of a pytree-of-dataclasses to one compressed .npz."""
    arrays, spec = flatten_pytree(obj)
    payload = dict(arrays)
    payload["__spec__"] = np.frombuffer(
        json.dumps(spec).encode(), dtype=np.uint8)
    buf = io.BytesIO()
    np.savez_compressed(buf, **payload)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path) or ".",
                               suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(buf.getvalue())
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def load_pytree(path: str):
    with np.load(path, allow_pickle=False) as z:
        spec = json.loads(bytes(z["__spec__"]).decode())
        arrays = {k: z[k] for k in z.files if k != "__spec__"}
    return unflatten_pytree(arrays, spec)


# ---------------------------------------------------------------------------
# Scene cache proper


def default_cache_dir() -> str:
    """'' disables (set DXRPT_SCENE_CACHE= to turn off)."""
    d = os.environ.get("DXRPT_SCENE_CACHE")
    if d is not None:
        return d
    return os.path.expanduser("~/.cache/dxrpt_scene_cache")


def scene_cache_key(fbx_path: str, preset) -> str:
    h = hashlib.sha256()
    h.update(f"loader-v{LOADER_VERSION}".encode())
    # alpha-split preprocessing (scene/alphasplit.py) changes the built
    # geometry, so its config is part of the key
    h.update(("alphasplit:"
              + os.environ.get("DXRPT_ALPHA_SPLIT", "")
              + ":" + os.environ.get("DXRPT_ALPHA_SPLIT_LEVEL", "4")).encode())
    h.update(repr(dataclasses.astuple(preset)).encode())
    with open(fbx_path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()[:32]


def load_cached_scene(fbx_path: str, preset):
    """Returns the cached Scene or None (miss / disabled / corrupt)."""
    d = default_cache_dir()
    if not d:
        return None
    path = os.path.join(d, scene_cache_key(fbx_path, preset) + ".npz")
    if not os.path.exists(path):
        return None
    try:
        scene = load_pytree(path)
        log.info("scene cache hit: %s", path)
        return scene
    except Exception as e:  # corrupt/stale entry: fall back to the parser
        log.warning("scene cache entry unreadable (%s) — reparsing: %s",
                    path, e)
        return None


def store_cached_scene(fbx_path: str, preset, scene) -> None:
    d = default_cache_dir()
    if not d:
        return
    try:
        path = os.path.join(d, scene_cache_key(fbx_path, preset) + ".npz")
        save_pytree(path, scene)
        log.info("scene cache write: %s", path)
    except Exception as e:  # best-effort, like the reference's shader cache
        log.warning("scene cache write failed: %s", e)
