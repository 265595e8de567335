"""Shader hot reload — the TPU-native analog of the reference's file-watch
shader pipeline (ShaderCompilation.cpp:416 UpdateShaders polls source mtimes;
App.cpp:231-237 re-creates PSOs when a compiled shader changed).

Here the "shaders" are the Python modules XLA traces into device programs:
the jitted compute path under core/, render/, accel/, sky/ and bake/. Those
reload in place; the orchestration layers (scene/, app/, parallel/, utils/)
are the reference's C++ side — editing them needs a restart, exactly like the
reference (its hot reload covers HLSL only, not the engine).

Mechanics: ``ShaderWatcher.poll()`` stats the watched module files (the
reference's mtime poll); on a change the changed modules plus every package
module that (transitively) imports them reload dependency-first, so
``from x import f`` bindings in dependents re-resolve to the new code. The
session then rebuilds its jitted step (``RenderSession.rebuild_step`` — the
PSO re-create) and resets the progressive accumulation.
"""

from __future__ import annotations

import importlib
import os
import sys
import types

# The jitted compute path — our HLSL. Everything else is "C++": restart.
WATCHED_SUBPACKAGES = ("core", "render", "accel", "sky", "bake")


def _watched_modules(root: str, subpackages) -> dict[str, str]:
    """Loaded module name -> source file for the watched subtree of `root`."""
    prefixes = tuple(f"{root}.{sp}" for sp in subpackages)
    out = {}
    for name, mod in list(sys.modules.items()):
        if mod is None or not isinstance(mod, types.ModuleType):
            continue
        if name == root or name.startswith(root + "."):
            if not (name in prefixes
                    or name.startswith(tuple(p + "." for p in prefixes))):
                continue
            f = getattr(mod, "__file__", None)
            if f and os.path.exists(f):
                out[name] = f
    return out


def _package_modules(root: str) -> dict[str, types.ModuleType]:
    return {name: mod for name, mod in list(sys.modules.items())
            if isinstance(mod, types.ModuleType)
            and (name == root or name.startswith(root + "."))}


def _import_graph(root: str) -> dict[str, set]:
    """name -> set of package modules it uses. Edges come from each module's
    globals: a referenced package module, or any function/class whose
    __module__ lives in the package (covers `from x import f`)."""
    mods = _package_modules(root)
    deps: dict[str, set] = {}
    for name, mod in mods.items():
        d = set()
        for val in vars(mod).values():
            if isinstance(val, types.ModuleType):
                vn = getattr(val, "__name__", "")
                if vn in mods and vn != name:
                    d.add(vn)
            else:
                vn = getattr(val, "__module__", None)
                if vn and vn in mods and vn != name:
                    d.add(vn)
        deps[name] = d
    return deps


def reload_order(changed, root: str) -> list:
    """Changed modules + transitive dependents, dependencies first."""
    deps = _import_graph(root)
    changed = [c for c in changed if c in deps]
    # transitive dependents of the changed set
    affected = set(changed)
    grew = True
    while grew:
        grew = False
        for name, d in deps.items():
            if name not in affected and d & affected:
                affected.add(name)
                grew = True
    # topological order over the affected subgraph (deps before dependents);
    # cycles (rare: package __init__ re-exports) break by insertion order
    order, seen = [], set()

    def visit(n, stack):
        if n in seen or n in stack:
            return
        stack.add(n)
        for d in sorted(deps.get(n, ())):
            if d in affected:
                visit(d, stack)
        stack.discard(n)
        seen.add(n)
        order.append(n)

    for n in sorted(affected):
        visit(n, set())
    return order


class ShaderWatcher:
    """Polls watched module sources for changes and reloads them in place.

    The reference analog: ShaderCompilation.cpp keeps per-shader file
    timestamps and UpdateShaders() re-compiles the ones whose source (or
    include) changed; the app then re-creates the PSOs that used them.
    """

    def __init__(self, root: str = "dxrpathtracer_tpu",
                 subpackages=WATCHED_SUBPACKAGES):
        self.root = root
        self.subpackages = tuple(subpackages)
        self._mtimes: dict[str, float] = {}
        self._snapshot(initial=True)

    def _snapshot(self, initial=False):
        for name, f in _watched_modules(self.root, self.subpackages).items():
            try:
                self._mtimes[name] = os.stat(f).st_mtime
            except OSError:
                pass

    def poll(self) -> list:
        """Names of watched modules whose source changed since last poll.
        Newly imported modules are adopted (not reported) — matching the
        reference, which only reloads shaders it has already compiled."""
        changed = []
        for name, f in _watched_modules(self.root, self.subpackages).items():
            try:
                m = os.stat(f).st_mtime
            except OSError:
                continue
            prev = self._mtimes.get(name)
            self._mtimes[name] = m
            if prev is not None and m != prev:
                changed.append(name)
        return changed

    def reload(self, changed) -> list:
        """Reload `changed` + transitive dependents, dependencies first.
        Returns the list actually reloaded."""
        order = reload_order(changed, self.root)
        for name in order:
            importlib.reload(sys.modules[name])
        self._snapshot()
        return order

    def poll_and_reload(self) -> list:
        changed = self.poll()
        return self.reload(changed) if changed else []
