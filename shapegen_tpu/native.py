"""ctypes bindings to the native host kernels (native/shapegen_native.cpp).

Auto-builds the shared library on first use if a toolchain is present;
every entry point has a pure-numpy fallback, so the package works without a
compiler. Used by the host data/preprocessing pipeline (device-side FPS lives
in ops.geometry for on-TPU batches).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libshapegen_native.so")
_lib: Optional[ctypes.CDLL] = None
_has_lsa = False
_tried = False
# _load can race: _hungarian_pairs_host fans emd_pair out over a thread
# pool, and a fresh checkout builds the .so on first use — without the lock
# two threads could run concurrent `make`s writing the same file while a
# third CDLLs the partially-linked result.
_load_lock = threading.Lock()


def _make(force: bool = False) -> bool:
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR] + (["-B"] if force else []),
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _has_lsa, _tried
    if _lib is not None or _tried:
        return _lib
    with _load_lock:
        if _lib is not None or _tried:
            return _lib
        lib = _load_locked()
        _has_lsa = lib is not None and hasattr(lib, "lsa_f32")
        if lib is not None:
            _set_signatures(lib)
        # Publish only after signatures are set; _tried last so concurrent
        # lock-free fast-path readers never see a half-initialized handle.
        _lib = lib
        _tried = True
        return _lib


def _load_locked() -> Optional[ctypes.CDLL]:
    if not os.path.exists(_LIB_PATH) and not _make():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    if not hasattr(lib, "lsa_f32"):
        # Stale prebuilt .so predating the assignment solver. Unlink BEFORE
        # rebuilding — the open mapping keeps its inode alive, and `make`
        # then links a NEW inode (rewriting a currently-mapped ELF in place
        # is undefined behavior). If the rebuild fails (no toolchain) or
        # still lacks the symbol, keep serving the legacy kernels from the
        # stale handle rather than losing them too.
        try:
            os.remove(_LIB_PATH)
        except OSError:
            pass
        if _make(force=True):
            try:
                new_lib = ctypes.CDLL(_LIB_PATH)
                if hasattr(new_lib, "lsa_f32"):
                    return new_lib
            except OSError:
                pass
    return lib


def _set_signatures(lib: ctypes.CDLL) -> None:
    lib.fps_f32.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.fps_f32.restype = None
    lib.voxels_to_points_f32.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_float, ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
    ]
    lib.voxels_to_points_f32.restype = ctypes.c_int64
    lib.points_to_voxels_f32.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.points_to_voxels_f32.restype = None
    if hasattr(lib, "lsa_f32"):
        lib.lsa_f32.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.lsa_f32.restype = ctypes.c_int
        lib.emd_pair_f32.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
        ]
        lib.emd_pair_f32.restype = ctypes.c_double


def available() -> bool:
    return _load() is not None


def has_lsa() -> bool:
    """True only when the loaded library exposes the assignment solver
    (``lsa_f32``/``emd_pair_f32``). ``available()`` can be true with a stale
    prebuilt .so that predates the solver (the loader deliberately keeps the
    legacy handle when a rebuild fails) — callers that need ``emd_pair``/
    ``lsa`` specifically must check this predicate, not ``available()``."""
    _load()
    return _has_lsa


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def fps_indices(points: np.ndarray, npoint: int, start_idx: int = 0) -> np.ndarray:
    """FPS indices over (n, 3) float32 points. Native or numpy fallback."""
    points = np.ascontiguousarray(points[:, :3], np.float32)
    n = len(points)
    lib = _load()
    if lib is not None:
        out = np.empty(npoint, np.int32)
        scratch = np.empty(n, np.float32)
        lib.fps_f32(
            _fptr(points), n, npoint, start_idx,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), _fptr(scratch),
        )
        return out
    # numpy fallback (same algorithm, preprocessing.py:7-28 semantics)
    dist = np.full(n, np.inf, np.float32)
    farthest = start_idx % n
    out = np.zeros(npoint, np.int32)
    for i in range(npoint):
        out[i] = farthest
        d = np.sum((points - points[farthest]) ** 2, axis=1)
        np.minimum(dist, d, out=dist)
        farthest = int(np.argmax(dist))
    return out


def voxels_to_points(voxels: np.ndarray, threshold: float = 0.5,
                     capacity: Optional[int] = None) -> np.ndarray:
    """Occupied cells as [x, y, z] float32 rows in scan order."""
    voxels = np.ascontiguousarray(voxels, np.float32)
    d, h, w = voxels.shape
    lib = _load()
    if lib is not None:
        cap = capacity or d * h * w
        out = np.empty((cap, 3), np.float32)
        count = lib.voxels_to_points_f32(
            _fptr(voxels), d, h, w, threshold, _fptr(out), cap
        )
        return out[:count].copy()
    zz, yy, xx = np.nonzero(voxels > threshold)
    pts = np.stack([xx, yy, zz], axis=1).astype(np.float32)
    return pts[:capacity] if capacity else pts


def lsa(cost: np.ndarray) -> Optional[np.ndarray]:
    """Exact linear sum assignment over a dense (n, m) cost matrix.

    Returns col4row (n,) int32 — the assigned column per row — or None when
    the native library is unavailable (callers fall back to scipy). Same
    shortest-augmenting-path algorithm as scipy.optimize.linear_sum_assignment
    (Crouse 2016), with the cost matrix kept float32 (half the bandwidth of
    scipy's internal float64 copy) and float64 duals, so the result is
    optimal for the float32-rounded costs. Handles n > m by solving the
    transpose and inverting the assignment.
    """
    lib = _load()
    if lib is None or not _has_lsa:
        return None
    cost = np.ascontiguousarray(cost, np.float32)
    if not np.isfinite(cost).all():
        # scipy raises here; the native Dijkstra would silently route
        # around NaN entries (NaN comparisons are all-false) and return a
        # finite-but-wrong total. Match scipy's loud failure.
        raise ValueError("matrix contains invalid numeric entries")
    n, m = cost.shape
    if n > m:
        row4col = lsa(np.ascontiguousarray(cost.T))
        if row4col is None:
            return None
        col4row = np.full(n, -1, np.int32)
        col4row[row4col] = np.arange(m, dtype=np.int32)
        return col4row
    out = np.empty(n, np.int32)
    rc = lib.lsa_f32(
        _fptr(cost), n, m, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    )
    return out if rc == 0 else None


def emd_pair(x: np.ndarray, y: np.ndarray) -> Optional[float]:
    """Exact Hungarian EMD for one (n, 3)/(m, 3) pair — fused cost build +
    assignment in C++ (metrics.py:49-92 inner loop minus cube normalization,
    which the caller applies). The cost matrix is the exact direct-form
    Euclidean distance (no matmul cancellation). Returns
    sum(assigned dists) / max(n, m), or None if native is unavailable.
    """
    lib = _load()
    if lib is None or not _has_lsa:
        return None
    x = np.ascontiguousarray(x, np.float32)
    y = np.ascontiguousarray(y, np.float32)
    if not (np.isfinite(x).all() and np.isfinite(y).all()):
        # Match the scipy path's behavior on corrupt clouds (its cost
        # matrix check raises); silence here would average a wrong metric.
        raise ValueError("matrix contains invalid numeric entries")
    if x.shape[0] > y.shape[0]:
        x, y = y, x  # assignment total is symmetric; solver needs n <= m
    n, m = x.shape[0], y.shape[0]
    dim = x.shape[1]
    scratch = np.empty((n, m), np.float32)
    col4row = np.empty(n, np.int32)
    total = lib.emd_pair_f32(
        _fptr(x), n, _fptr(y), m, dim, _fptr(scratch),
        col4row.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if total < 0:
        return None
    return float(total) / max(n, m)


def points_to_voxels(points: np.ndarray, resolution: int = 32) -> np.ndarray:
    """[z, y, x]-ordered occupancy scatter of [-1,1] points (data.py:220-228)."""
    points = np.ascontiguousarray(points[:, :3], np.float32)
    lib = _load()
    if lib is not None:
        out = np.empty((resolution,) * 3, np.float32)
        lib.points_to_voxels_f32(_fptr(points), len(points), resolution, _fptr(out))
        return out
    pts = (points + 1) * (resolution - 1) / 2
    pts = np.clip(pts, 0, resolution - 1).astype(int)
    grid = np.zeros((resolution,) * 3, np.float32)
    grid[pts[:, 2], pts[:, 1], pts[:, 0]] = 1
    return grid
