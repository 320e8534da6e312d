"""Pallas chamfer kernel tests (interpret mode on the CPU harness)."""

import jax
import jax.numpy as jnp
import numpy as np

from shapegen_tpu import metrics
from shapegen_tpu.ops.pallas_kernels import (
    chamfer_distance_pallas,
    min_dists_pallas,
)


def test_min_dists_matches_bruteforce(rng):
    x = jnp.asarray(rng.standard_normal((2, 300, 3)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((2, 520, 3)).astype(np.float32))
    d_xy, d_yx = min_dists_pallas(x, y, interpret=True)
    full = np.sum(
        (np.asarray(x)[:, :, None, :] - np.asarray(y)[:, None, :, :]) ** 2, -1
    )
    np.testing.assert_allclose(np.asarray(d_xy), full.min(2), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(d_yx), full.min(1), rtol=1e-5, atol=1e-6)


def test_pallas_chamfer_matches_xla_chamfer(rng):
    x = jnp.asarray(rng.standard_normal((2, 256, 3)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((2, 512, 3)).astype(np.float32))
    want = float(metrics.chamfer_distance(x, y))
    got = float(chamfer_distance_pallas(x, y, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_pallas_chamfer_identical_near_zero(rng):
    x = jnp.asarray(rng.standard_normal((1, 256, 3)).astype(np.float32))
    assert float(chamfer_distance_pallas(x, x, interpret=True)) < 1e-3


def test_padding_sentinels_do_not_leak(rng):
    # Non-tile-multiple sizes exercise the sentinel padding.
    x = jnp.asarray(rng.standard_normal((1, 100, 3)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((1, 70, 3)).astype(np.float32))
    d_xy, d_yx = min_dists_pallas(x, y, interpret=True)
    assert d_xy.shape == (1, 100) and d_yx.shape == (1, 70)
    assert np.isfinite(np.asarray(d_xy)).all()
    full = np.sum(
        (np.asarray(x)[:, :, None, :] - np.asarray(y)[:, None, :, :]) ** 2, -1
    )
    np.testing.assert_allclose(np.asarray(d_xy), full.min(2), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(d_yx), full.min(1), rtol=1e-5, atol=1e-6)
