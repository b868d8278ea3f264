"""Native C++ BVH builder tests: compile, agree with the numpy oracle,
and survive large inputs (the reference's native-speed SweepBuilder role)."""

import numpy as np
import pytest

from echorenderer_tpu.native import build_bvh_native, load


def _boxes(n, seed=0):
    rs = np.random.RandomState(seed)
    c = rs.uniform(-50, 50, (n, 3)).astype(np.float32)
    e = rs.uniform(0.01, 1.0, (n, 3)).astype(np.float32)
    return c - e, c + e


needs_native = pytest.mark.skipif(load() is None, reason="no C++ toolchain")


@needs_native
class TestNativeBuilder:
    def test_structure_valid(self):
        amin, amax = _boxes(500)
        cmin, cmax, ccode, order, root = build_bvh_native(amin, amax, 4)
        assert sorted(order.tolist()) == list(range(500))  # permutation
        assert root >= 0
        # every interior child bound contains its primitives
        def decode(code):
            bits = -(code + 1)
            return bits >> 4, bits & 15

        def walk(code, lo, hi):
            if code < 0:
                start, count = decode(code)
                ids = order[start : start + count]
                assert (amin[ids] >= lo - 1e-4).all()
                assert (amax[ids] <= hi + 1e-4).all()
                return count
            total = 0
            for side in range(2):
                total += walk(
                    int(ccode[code, side]), cmin[code, side], cmax[code, side]
                )
            return total

        big = np.full(3, -1e38, np.float32)
        assert walk(root, -np.abs(big), np.abs(big)) == 500

    def test_matches_numpy_oracle(self):
        """Same SAH strategy -> identical tree (same sort tie-breaking)."""
        from echorenderer_tpu.aggregation import bvh as bvh_mod

        amin, amax = _boxes(200, seed=3)
        native = build_bvh_native(amin, amax, 4)
        # force the numpy path
        import echorenderer_tpu.native as native_mod

        saved = native_mod.build_bvh_native
        try:
            native_mod.build_bvh_native = lambda *a, **k: None
            ref = bvh_mod.build_bvh(amin, amax, 4)
        finally:
            native_mod.build_bvh_native = saved
        np.testing.assert_array_equal(np.asarray(ref.prim_order), native[3])
        np.testing.assert_array_equal(np.asarray(ref.child_code), native[2])
        np.testing.assert_allclose(np.asarray(ref.child_min), native[0], atol=1e-6)
        assert int(np.asarray(ref.root_code)) == native[4]

    def test_large_build_fast(self):
        import time

        amin, amax = _boxes(300_000, seed=1)
        t0 = time.perf_counter()
        out = build_bvh_native(amin, amax, 4)
        dt = time.perf_counter() - t0
        assert out is not None
        assert dt < 30.0, f"native build too slow: {dt:.1f}s"

    def test_single_primitive(self):
        amin, amax = _boxes(1)
        cmin, cmax, ccode, order, root = build_bvh_native(amin, amax, 4)
        assert root < 0  # leaf code
        assert order.tolist() == [0]
