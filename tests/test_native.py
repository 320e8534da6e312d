"""Native C++ host-kernel tests (with numpy-fallback parity)."""

import numpy as np
import pytest

from shapegen_tpu import native


def test_native_builds_and_loads():
    assert native.available(), "native lib should build in this image (g++)"


def test_fps_matches_numpy_oracle(rng):
    pts = rng.standard_normal((200, 3)).astype(np.float32)
    got = native.fps_indices(pts, 16, start_idx=0)
    # Sequential oracle.
    dist = np.full(200, np.inf)
    far = 0
    want = []
    for _ in range(16):
        want.append(far)
        d = np.sum((pts - pts[far]) ** 2, axis=1)
        dist = np.minimum(dist, d)
        far = int(np.argmax(dist))
    np.testing.assert_array_equal(got, want)


def test_fps_speed_vs_numpy(rng):
    import time

    if not native.available():
        pytest.skip("no native lib")
    pts = rng.standard_normal((20000, 3)).astype(np.float32)
    t0 = time.perf_counter()
    native.fps_indices(pts, 2048)
    native_t = time.perf_counter() - t0
    # The numpy path of the same algorithm, forced:
    lib, native._lib = native._lib, None
    tried = native._tried
    native._tried = True
    try:
        t0 = time.perf_counter()
        native.fps_indices(pts, 2048)
        numpy_t = time.perf_counter() - t0
    finally:
        native._lib = lib
        native._tried = tried
    assert native_t < numpy_t, (native_t, numpy_t)


def test_voxels_to_points_scan_order():
    g = np.zeros((4, 4, 4), np.float32)
    g[1, 2, 3] = 1.0
    g[3, 0, 0] = 1.0
    pts = native.voxels_to_points(g)
    np.testing.assert_array_equal(pts, [[3, 2, 1], [0, 0, 3]])


def test_points_to_voxels_axis_order():
    pts = np.array([[1.0, -1.0, 0.0]], np.float32)  # x=1 -> 31, y=-1 -> 0, z=0 -> 15
    g = native.points_to_voxels(pts, 32)
    assert g[15, 0, 31] == 1.0  # [z, y, x] order (data.py:227)
    assert g.sum() == 1.0


def test_roundtrip_native_vs_numpy(rng):
    g = (rng.random((16, 16, 16)) > 0.9).astype(np.float32)
    pts_native = native.voxels_to_points(g)
    zz, yy, xx = np.nonzero(g > 0.5)
    pts_np = np.stack([xx, yy, zz], 1).astype(np.float32)
    np.testing.assert_array_equal(pts_native, pts_np)
