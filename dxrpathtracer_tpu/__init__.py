"""dxrpathtracer_tpu — a TPU-native progressive wavefront path tracer.

A brand-new JAX/XLA/Pallas framework with the capabilities of MJP's DXRPathTracer
(WANG-Ruipeng fork, reference mounted at /root/reference). The DXR
megakernel-with-hardware-recursion design is replaced by a TPU-first wavefront
architecture: SoA ray batches in HBM, a statically-unrolled bounce loop, a threaded
(skip-link) LBVH traversed by vectorized/Pallas kernels, and XLA fusion for shading
math. Scene state is immutable pytrees; frame state (accumulation image, sample
index) is an explicit carry, so progressive rendering is a pure function.

Layer map (mirrors SURVEY.md §7):
  core/     — math, CMJ RNG, sampling, BRDF (parity with Sampling.hlsl/BRDF.hlsl)
  scene/    — scene pytrees, procedural generators, FBX import, textures
  accel/    — LBVH build + traversal (replaces DXR TLAS/BLAS + TraceRay)
  sky/      — Hosek-Wilkie sun/sky (replaces HosekSky/ + SkyCache)
  render/   — camera, wavefront integrator, accumulation, post-processing
  bake/     — GI lightmap baking (replaces Baking.hlsl/SurfaceMap.hlsl)
  parallel/ — multi-chip pixel-tile sharding over jax.sharding.Mesh
  app/      — settings registry, render session, profiler, CLI
"""

__version__ = "0.1.0"

# Persistent XLA compilation cache: the tunneled TPU pays seconds per compile,
# and every fresh process would otherwise recompile the whole pipeline
# (ShaderCompilation.cpp:42-60's on-disk shader cache is the reference analog).
import os as _os

try:
    import hashlib as _hashlib

    import jax as _jax

    def _host_cache_key():
        """Key the cache by host CPU features + jax version: XLA:CPU entries
        are AOT host binaries, and an entry compiled on a host with different
        machine features LOADS (with an error log) but can produce silently
        WRONG numerics (observed: furnace sphere 0.704 vs true 0.8688 from a
        cache entry carrying +prefer-no-scatter/-gather this host lacks)."""
        feats = ""
        model = ""
        try:
            with open("/proc/cpuinfo") as f:
                for line in f:
                    if line.startswith("flags") and not feats:
                        feats = " ".join(sorted(line.split(":")[1].split()))
                    elif line.startswith("model name") and not model:
                        model = line.split(":", 1)[1].strip()
                    if feats and model:
                        break
        except OSError:
            pass
        return _hashlib.sha1(
            (feats + model + _jax.__version__).encode()).hexdigest()[:12]

    if _os.environ.get("DXRPT_NO_COMPILATION_CACHE"):
        _cache_dir = ""
    else:
        _cache_dir = _os.environ.get(
            "DXRPT_COMPILATION_CACHE",
            _os.path.expanduser("~/.cache/dxrpt_xla_cache"))
    _cache_root = _cache_dir
    if _cache_dir:
        _cache_dir = _os.path.join(_cache_dir, _host_cache_key())
        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:  # pragma: no cover - cache is best-effort
    _cache_root = ""


def pin_backend_cache_dir():
    """Re-point the persistent compile cache at a backend-stable directory
    once the real backend is known (call after jax backend init, before the
    first compile — RenderSession.__init__ does).

    Why: the import-time cache dir is keyed by host CPU features because
    XLA:CPU entries are host-AOT binaries (wrong-numerics hazard across
    hosts, see _host_cache_key). But TPU executables are portable, and the
    host key CHANGES when the VM migrates — round 3's driver bench paid a
    189.8 s cold compile because its morning VM reported different cpuinfo
    flags than the builder session that warmed the cache (two sibling cache
    dirs, 89 MB of TPU entries stranded). Accelerator entries now live in
    one `<backend>-jax<version>` directory that survives migrations; the
    CPU backend keeps the host key."""
    import jax

    if not _cache_root or _os.environ.get("DXRPT_NO_COMPILATION_CACHE"):
        return None
    backend = jax.default_backend()
    if backend == "cpu":
        # The host-feature key is NOT sufficient for XLA:CPU AOT entries:
        # observed live (round 4) — a VM migration kept /proc/cpuinfo
        # identical while LLVM's detected tuning changed
        # (+prefer-no-scatter/gather), so same-key entries loaded with an
        # error log and undefined numerics. Three incidents of this class
        # now; CPU caching is opt-in (DXRPT_CPU_CACHE=1) and correctness
        # tooling (tests, crosscheck) must never set it.
        if not _os.environ.get("DXRPT_CPU_CACHE"):
            jax.config.update("jax_compilation_cache_dir", None)
        return None
    stable = _os.path.join(_cache_root, f"{backend}-jax{jax.__version__}")
    _os.makedirs(stable, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", stable)
    return stable
