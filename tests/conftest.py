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


# ---------------------------------------------------------------------------
# Test tiers (VERDICT round-3 weak #4: the full suite runs ~1 h single-process
# on a 1-core host — useless to a round driver). `pytest -m quick` is the
# < 10-minute correctness core: goldens, furnace energy, the brute-force
# traversal oracle, one multichip equality pin, CMJ/BRDF parity, raster
# parity, the independent-oracle image pins. Durations measured 2026-08-20
# (tests/, --durations=0); heavyweight equivalence sweeps (compact-schedule,
# history, sample-parallel, 64-sample furnace MC) stay full-tier only.
import pytest  # noqa: E402

_QUICK = {
    ("test_golden.py", "test_boxtest_golden_image"),
    ("test_golden.py", "test_white_furnace_fbx_scene"),
    ("test_golden.py", "test_white_furnace_no_compensation_energy"),
    ("test_golden.py", "test_sponza_standin_golden_image"),
    ("test_bvh.py", "test_bvh_structure"),
    ("test_bvh.py", "test_bvh_structure_morton"),
    ("test_bvh.py", "test_closest_hit_matches_brute_force"),
    ("test_bvh.py", "test_any_hit_matches_brute_force"),
    ("test_bvh.py", "test_boxtest_scene_hits"),
    ("test_bvh.py", "test_t_range_respected"),
    ("test_bvh.py", "test_alpha_test_accept_fn"),
    ("test_bvh.py", "test_quarantine_pad_equivalence"),
    ("test_bvh.py", "test_compaction_phases_match_brute_force"),
    ("test_cmj.py", "test_cmj_bit_exact"),
    ("test_cmj.py", "test_cmj_stratification"),
    ("test_cmj.py", "test_cmj_rand_float_range"),
    ("test_sampling.py", None),
    ("test_brdf.py", None),
    ("test_camera.py", None),
    ("test_multichip.py", "test_sharded_equals_single"),
    ("test_packet.py", "test_packet_matches_perray_coherent"),
    ("test_swraster.py", "test_raster_matches_bvh_boxtest"),
    ("test_swraster.py", "test_near_plane_crossing_triangle"),
    ("test_exr.py", "test_cross_validate_cv2_reads_ours"),
    ("test_exr.py", "test_cross_validate_we_read_cv2"),
    ("test_oracle.py", "test_oracle_boxtest"),
    ("test_oracle.py", "test_oracle_white_furnace"),
    # the alpha-tested large-scene oracle pin (VERDICT r4 #3: the punch-
    # through path validated against an independent integrator every run)
    ("test_oracle.py", "test_oracle_large_scenes[SunTemple]"),
    ("test_integrator.py", "test_white_furnace_miss_is_one"),
    ("test_alphasplit.py", "test_classifier_matches_bruteforce"),
    ("test_alphasplit.py", "test_extreme_masks"),
    ("test_alphasplit.py", "test_cache_key_includes_split_env"),
}

_SLOW = {
    ("test_integrator.py", "test_white_furnace_energy"),
    ("test_integrator.py", "test_history_seeded_samples_identical"),
    ("test_integrator.py", "test_progressive_accumulation_is_running_mean"),
    ("test_multichip.py", "test_sample_parallel_equals_sequential"),
    ("test_multichip.py", "test_sharded_bake_equals_single"),
    ("test_bvh.py", "test_compact_schedule_knobs_equivalence"),
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        fname = os.path.basename(str(item.fspath))
        base = item.name.split("[")[0]
        if ((fname, base) in _QUICK or (fname, None) in _QUICK
                or (fname, item.name) in _QUICK):
            item.add_marker(pytest.mark.quick)
        if (fname, base) in _SLOW or (fname, None) in _SLOW:
            item.add_marker(pytest.mark.slow)
