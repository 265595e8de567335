"""Native C++ LBVH builder vs the numpy reference implementation."""

import numpy as np
import pytest

from dxrpathtracer_tpu.accel import native
from dxrpathtracer_tpu.accel.lbvh import build_bvh


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
@pytest.mark.parametrize("mode", ["morton", "sah"])
def test_native_builder_bit_identical(mode):
    rng = np.random.default_rng(7)
    for t in (1, 2, 5, 100, 4097):
        v0 = rng.uniform(-10, 10, (t, 3)).astype(np.float32)
        v1 = v0 + rng.uniform(-0.5, 0.5, (t, 3)).astype(np.float32)
        v2 = v0 + rng.uniform(-0.5, 0.5, (t, 3)).astype(np.float32)
        bn = build_bvh(v0, v1, v2, use_native=True, mode=mode)
        bp = build_bvh(v0, v1, v2, use_native=False, mode=mode)
        assert bn.num_rows == bp.num_rows
        assert bn.num_leaves == bp.num_leaves
        assert bn.root_code == bp.root_code
        # NaN bit patterns live in the bitcast code/ID columns: compare bytes.
        assert np.asarray(bn.table).tobytes() == np.asarray(bp.table).tobytes()


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
def test_native_count_nodes():
    packed = native.build_packed(
        np.zeros((10, 3), np.float32) + np.arange(10, dtype=np.float32)[:, None],
        np.ones((10, 3), np.float32) + np.arange(10, dtype=np.float32)[:, None],
        np.full((10, 3), 0.5, np.float32) + np.arange(10, dtype=np.float32)[:, None])
    assert packed is not None
    table, n_rows, n_leaves, depth, root_code = packed
    assert table.shape == (n_rows, 128)
    assert n_leaves >= 1 and depth >= 1


def test_native_split_matches_numpy():
    """Native split-table (MXU) emission is bit-identical to the numpy
    mirror (codes are bitcast int32 -> compare raw bits, not floats)."""
    import numpy as np
    from dxrpathtracer_tpu.accel import native
    from dxrpathtracer_tpu.accel.lbvh import build_split_tables_numpy_sah

    if not native.available():
        import pytest
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(11)
    m = 5000
    v0 = (rng.standard_normal((m, 3)) * 4).astype(np.float32)
    v1 = v0 + rng.standard_normal((m, 3)).astype(np.float32) * 0.5
    v2 = v0 + rng.standard_normal((m, 3)).astype(np.float32) * 0.5
    nat = native.build_packed_sah_split(v0, v1, v2, 64)
    ref = build_split_tables_numpy_sah(v0, v1, v2, 64)
    assert nat is not None
    assert np.array_equal(nat[0].view(np.uint32), ref[0].view(np.uint32))
    assert np.array_equal(nat[1].view(np.uint32), ref[1].view(np.uint32))
    assert nat[2:] == ref[2:]
