import os

# Force CPU with 8 virtual devices BEFORE jax initializes: multi-chip sharding
# tests run on a simulated mesh (SURVEY.md §4 — the CPU backend is our "WARP
# software raytracing" equivalent for CI).
os.environ.setdefault("JAX_PLATFORMS", "cpu")
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
