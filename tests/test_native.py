"""Native C++ rasterizer must agree exactly with the numpy reference path."""

import numpy as np
import pytest

from pixray_tpu.ops import cellrender


def _test_polygons():
    rng = np.random.default_rng(0)
    polys = []
    # a grid of rects + some overlapping diamonds
    for r in range(4):
        for c in range(6):
            x1, y1 = c * 5.0, r * 5.0
            x2, y2 = x1 + 5.0, y1 + 5.0
            polys.append(np.array([[x1, y1], [x2, y1], [x2, y2], [x1, y2]]))
    for _ in range(6):
        cx, cy = rng.random(2) * [30, 20]
        s = 4.0
        polys.append(np.array([[cx, cy - s], [cx + s, cy], [cx, cy + s], [cx - s, cy]]))
    return polys


def test_native_matches_numpy():
    lib = cellrender._load_native()
    if lib is None:
        pytest.skip("native rasterizer unavailable (no g++?)")
    polys = _test_polygons()
    native_idx, native_valid = cellrender._trim_depth(
        *cellrender._build_coverage_map_native(polys, 30, 20, lib)
    )

    # force the numpy path
    saved = cellrender._native_lib, cellrender._native_checked
    cellrender._native_lib, cellrender._native_checked = None, True
    try:
        np_idx, np_valid = cellrender.build_coverage_map(polys, 30, 20)
    finally:
        cellrender._native_lib, cellrender._native_checked = saved

    np.testing.assert_array_equal(native_valid, np_valid)
    # indices only meaningful where valid
    np.testing.assert_array_equal(
        np.where(native_valid, native_idx, -1), np.where(np_valid, np_idx, -1)
    )
