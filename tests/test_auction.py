"""Device auction assignment solver vs the Hungarian oracle.

The auction solver (ops/auction.py) replaces the host Hungarian
(/root/reference/metrics.py:49-92) on the eval hot path; its accuracy
contract is |total - optimal| <= n * eps_final. These tests pin that
contract against scipy's linear_sum_assignment and against the native C++
solver on cloud-shaped pairs.
"""

import jax
import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from shapegen_tpu.ops.auction import auction_assignment, auction_emd_pairs

EPS = 1e-5


def _opt(cost):
    r, c = linear_sum_assignment(cost)
    return cost[r, c].sum()


def _assert_valid(col4row, n):
    assert (col4row >= 0).all()
    assert len(set(col4row.tolist())) == n  # distinct columns


@pytest.mark.parametrize(
    "B,n,m",
    [(4, 16, 16), (3, 32, 48), (2, 64, 64), (1, 128, 128)],
)
def test_auction_matches_hungarian_random(B, n, m):
    rng = np.random.default_rng(hash((B, n, m)) % 2**31)
    cost = rng.random((B, n, m)).astype(np.float32) * 2.0
    col4row, total, _ = auction_assignment(
        cost, eps_final=EPS, eps_start=0.5
    )
    col4row = np.asarray(col4row)
    total = np.asarray(total)
    for b in range(B):
        _assert_valid(col4row[b], n)
        opt = _opt(cost[b])
        assert total[b] <= opt + n * EPS + 1e-5
        assert total[b] >= opt - 1e-4  # can't beat the optimum


def test_auction_tie_heavy_costs():
    """Integer (massively tied) costs — the worst case for bidding
    increments — still certify within the n*eps bound."""
    rng = np.random.default_rng(7)
    cost = rng.integers(0, 4, (3, 48, 48)).astype(np.float32)
    _, total, _ = auction_assignment(cost, eps_final=1e-4, eps_start=1.0)
    for b in range(3):
        assert float(total[b]) <= _opt(cost[b]) + 48 * 1e-4 + 1e-4


def test_auction_emd_matches_native_hungarian_clouds():
    """Cloud-geometry costs (cube-normalized Euclidean — the benchmark
    shape): per-pair EMD matches the exact solver to ~1e-6 relative."""
    from shapegen_tpu.metrics.metrics import _hungarian_emd_pair

    rng = np.random.default_rng(24)

    def cube(p):
        c = (p.max(0) + p.min(0)) / 2.0
        p = p - c
        return p / np.abs(p).max()

    n = 96
    x = np.stack([cube(rng.standard_normal((n, 3)).astype(np.float32))
                  for _ in range(3)])
    y = np.stack([cube(rng.standard_normal((n, 3)).astype(np.float32))
                  for _ in range(3)])
    got = np.asarray(jax.device_get(auction_emd_pairs(x, y, eps_final=EPS)))
    want = np.asarray([_hungarian_emd_pair(x[b], y[b]) for b in range(3)])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=EPS)


def test_auction_emd_unequal_point_counts():
    """n != m pairs (units.py uses 994 vs 948) route through the zero-pad
    square reduction; EMD normalizes by max(n, m)."""
    from shapegen_tpu.metrics.metrics import _hungarian_emd_pair

    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 40, 3)).astype(np.float32)
    y = rng.standard_normal((1, 56, 3)).astype(np.float32)
    got = float(np.asarray(jax.device_get(
        auction_emd_pairs(x, y, eps_final=EPS)
    ))[0])
    want = _hungarian_emd_pair(x[0], y[0])
    assert got == pytest.approx(want, rel=1e-4, abs=EPS)


def test_auction_permutation_invariance():
    """Shuffling either cloud leaves the EMD unchanged (assignment is over
    sets, not orderings)."""
    rng = np.random.default_rng(5)
    x = rng.standard_normal((1, 64, 3)).astype(np.float32)
    y = rng.standard_normal((1, 64, 3)).astype(np.float32)
    base = float(np.asarray(auction_emd_pairs(x, y, eps_final=EPS))[0])
    perm = rng.permutation(64)
    shuf = float(np.asarray(
        auction_emd_pairs(x[:, perm], y, eps_final=EPS)
    )[0])
    assert shuf == pytest.approx(base, rel=1e-5, abs=EPS)
