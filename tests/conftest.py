import os

# XLA:CPU compiles of the deepest traversal while_loops have segfaulted
# inside backend_compile_and_load when the suite runs long in one process
# (observed twice at tests/test_raster.py PCF compiles, 2026-08-19; the same
# test passes in a fresh process). The crash signature is compile-time
# recursion vs the default 8 MB main-thread stack — raise the soft limit to
# the hard limit before anything compiles.
import resource

try:
    _soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
    resource.setrlimit(resource.RLIMIT_STACK, (_hard, _hard))
except (ValueError, OSError):
    pass

# Force CPU with 8 virtual devices BEFORE jax initializes: multi-chip sharding
# tests run on a simulated mesh (SURVEY.md §4 — the CPU backend is our "WARP
# software raytracing" equivalent for CI).
os.environ.setdefault("JAX_PLATFORMS", "cpu")

# Never let test numerics depend on the persistent compile cache: XLA:CPU
# entries are host-AOT binaries, and entries whose LLVM feature set differs
# from this host's LOAD with an error log but can execute with silently
# wrong numerics (observed twice: round-1 furnace regression; round-3
# "+prefer-no-scatter not supported on the host" loads). The cache remains
# on for TPU runs (bench/tools), where executables are portable.
os.environ["DXRPT_NO_COMPILATION_CACHE"] = "1"

# Tests must always exercise the real scene parsers — a stale scene-cache hit
# would mask parser regressions (the same class of silent degradation the
# bare-except removal addressed). Cache tests opt back in via monkeypatch.
os.environ["DXRPT_SCENE_CACHE"] = ""
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# Belt and braces: a TPU plugin (axon) may still register; pin the platform via
# the config API too (effective as long as no backend has initialized yet).
import jax  # noqa: E402

try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass
