"""Native C++ runtime: build, semantics parity with numpy, fused affine."""

import math

import numpy as np
import pytest

from unetsulc_tpu import runtime
from unetsulc_tpu.data.geometry import random_rotation
from unetsulc_tpu.data.voxelize import voxelize

needs_native = pytest.mark.skipif(
    not runtime.native_available(), reason="no g++ / native build failed"
)


@needs_native
def test_native_matches_numpy():
    rng = np.random.default_rng(0)
    bck2 = rng.integers(0, 30, size=(500, 3))
    bck2[0] = 0  # origin guaranteed
    labels = rng.integers(0, 7, size=500).astype(np.int32)
    a_in, a_lb = voxelize(bck2, labels, img_size=(32, 32, 32), use_native=False)
    b_in, b_lb = runtime.voxelize_native(bck2, labels, (32, 32, 32))
    np.testing.assert_array_equal(a_in, b_in)
    np.testing.assert_array_equal(a_lb, b_lb)


@needs_native
def test_native_fused_affine_matches_python_path():
    """C++ (affine+translate+scatter) == geometry.rotate_points + voxelize."""
    from unetsulc_tpu.data.geometry import rotate_points

    rng = np.random.default_rng(1)
    pts = rng.integers(0, 40, size=(300, 3))
    pts -= pts.min(axis=0)
    center = (pts.max(axis=0) - pts.min(axis=0)) / 2
    transrot = random_rotation(center, math.pi / 16, np.random.default_rng(7))
    labels = rng.integers(0, 5, size=300).astype(np.int32)

    ref = rotate_points(pts, transrot)
    ref = ref - ref.min(axis=0)
    a_in, a_lb = voxelize(ref, labels, img_size=(64, 64, 64), use_native=False)

    b_in, b_lb = runtime.voxelize_native(
        pts, labels, (64, 64, 64), affine=transrot[:3, :]
    )
    np.testing.assert_array_equal(a_in, b_in)
    np.testing.assert_array_equal(a_lb, b_lb)


@needs_native
def test_native_out_of_bounds_clipped():
    bck2 = np.array([[0, 0, 0], [100, 0, 0]])
    labels = np.array([3, 4], np.int32)
    vol_in, vol_lb = runtime.voxelize_native(bck2, labels, (8, 8, 8))
    assert vol_in.sum() == 1.0
    assert vol_lb[0, 0, 0] == 3
