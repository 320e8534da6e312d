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


def test_lsa_matches_scipy(rng):
    """The native shortest-augmenting-path solver finds the same optimal
    assignment TOTAL as scipy's linear_sum_assignment (individual matchings
    may differ on exact ties; the optimum value is unique)."""
    from scipy.optimize import linear_sum_assignment

    if not native.available():
        pytest.skip("no native lib")
    for n, m in [(1, 1), (5, 5), (17, 23), (23, 17), (128, 128), (64, 200),
                 (200, 64)]:
        c = rng.random((n, m)).astype(np.float32)
        col4row = native.lsa(c)
        rows = np.flatnonzero(col4row >= 0)
        got = c[rows, col4row[rows]].sum(dtype=np.float64)
        r, cc = linear_sum_assignment(c)
        want = c[r, cc].sum(dtype=np.float64)
        assert got == pytest.approx(want, rel=1e-5), (n, m)
        # A valid assignment: distinct columns, min(n, m) of them.
        assert len(rows) == min(n, m)
        assert len(set(col4row[rows].tolist())) == min(n, m)

    # Heavy exact ties (integer costs) still land on the optimum.
    c = rng.integers(0, 4, (60, 60)).astype(np.float32)
    col4row = native.lsa(c)
    r, cc = linear_sum_assignment(c)
    assert c[np.arange(60), col4row].sum() == pytest.approx(c[r, cc].sum())


def test_emd_pair_matches_reference_formula(rng):
    """native.emd_pair == the reference's exact-EMD inner loop
    (metrics.py:49-92): direct-form Euclidean costs, Hungarian assignment,
    sum / max(n, m) — including unequal point counts both ways."""
    from scipy.optimize import linear_sum_assignment

    if not native.available():
        pytest.skip("no native lib")
    for n, m in [(180, 150), (150, 180), (128, 128)]:
        x = rng.standard_normal((n, 3)).astype(np.float32)
        y = rng.standard_normal((m, 3)).astype(np.float32)
        d = np.linalg.norm(x[:, None] - y[None, :], axis=-1)
        r, cc = linear_sum_assignment(d)
        want = d[r, cc].sum() / max(n, m)
        assert native.emd_pair(x, y) == pytest.approx(want, rel=1e-5)


def test_hungarian_metrics_native_vs_scipy_paths(rng, monkeypatch):
    """earth_mover_distance_hungarian gives the same value through the
    native solver and the scipy fallback (the fallback is forced by
    stubbing the native pair out)."""
    from shapegen_tpu.metrics import metrics as M

    x = rng.standard_normal((3, 96, 3)).astype(np.float32)
    y = rng.standard_normal((3, 80, 3)).astype(np.float32)
    via_native = M.earth_mover_distance_hungarian(x, y)
    monkeypatch.setattr(native, "emd_pair", lambda *a, **k: None)
    via_scipy = M.earth_mover_distance_hungarian(x, y)
    assert via_native == pytest.approx(via_scipy, rel=1e-5)


def test_lsa_and_emd_pair_reject_nonfinite(rng):
    """scipy raises on NaN/inf cost entries; the native path must fail just
    as loudly (its Dijkstra would otherwise route around NaNs and return a
    finite-but-wrong total that gets averaged into eval metrics)."""
    if not native.available():
        pytest.skip("no native lib")
    c = rng.random((8, 8)).astype(np.float32)
    c[3, 4] = np.nan
    with pytest.raises(ValueError, match="invalid numeric"):
        native.lsa(c)
    x = rng.standard_normal((16, 3)).astype(np.float32)
    y = rng.standard_normal((16, 3)).astype(np.float32)
    x[0, 0] = np.inf
    with pytest.raises(ValueError, match="invalid numeric"):
        native.emd_pair(x, y)


def test_native_load_is_thread_safe(rng, monkeypatch):
    """First-use build under concurrency: _hungarian_pairs_host fans
    emd_pair over a thread pool, so on a fresh checkout many threads race
    into _load simultaneously. The lock must serialize the build — every
    thread gets the same working solver, none crashes or silently falls
    back."""
    import os
    import shutil
    import threading

    from shapegen_tpu import native as nat

    if not nat.available():
        pytest.skip("no native lib/toolchain")
    # Reset loader state and move the built library aside so every thread
    # races through the first-build path (monkeypatch restores the module
    # globals afterwards; the library file is restored in the finally if
    # the racing rebuild failed, so a flaky build can't destroy the
    # artifact for later tests/processes).
    monkeypatch.setattr(nat, "_lib", None)
    monkeypatch.setattr(nat, "_tried", False)
    monkeypatch.setattr(nat, "_has_lsa", False)
    backup = None
    if os.path.exists(nat._LIB_PATH):
        backup = nat._LIB_PATH + ".bak"
        shutil.copy2(nat._LIB_PATH, backup)
        os.remove(nat._LIB_PATH)

    try:
        x = rng.standard_normal((64, 3)).astype(np.float32)
        y = rng.standard_normal((64, 3)).astype(np.float32)
        results, errors = [], []

        def worker():
            try:
                results.append(nat.emd_pair(x, y))
            except Exception as e:  # noqa: BLE001 — the test asserts none
                errors.append(e)

        threads = [threading.Thread(target=worker) for _ in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errors, errors
        assert all(r is not None for r in results)
        assert len({round(r, 7) for r in results}) == 1
    finally:
        if backup is not None:
            if not os.path.exists(nat._LIB_PATH):
                shutil.move(backup, nat._LIB_PATH)
            else:
                os.remove(backup)
