"""Pallas chamfer kernel tests (interpret mode on the CPU harness)."""

import jax
import jax.numpy as jnp
import numpy as np

from shapegen_tpu import metrics
from shapegen_tpu.ops.pallas_kernels import (
    chamfer_distance_pallas,
    min_dists_pallas,
    min_dists_vjp,
    min_dists_with_args_pallas,
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


def test_argmin_indices_match_bruteforce(rng):
    x = jnp.asarray(rng.standard_normal((2, 300, 3)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((2, 520, 3)).astype(np.float32))
    _, _, i_xy, i_yx = min_dists_with_args_pallas(x, y, interpret=True)
    full = np.sum(
        (np.asarray(x)[:, :, None, :] - np.asarray(y)[:, None, :, :]) ** 2, -1
    )
    np.testing.assert_array_equal(np.asarray(i_xy), full.argmin(2))
    np.testing.assert_array_equal(np.asarray(i_yx), full.argmin(1))


def test_argmin_indices_with_padding(rng):
    # Non-tile-multiple sizes: sentinel rows must never be selected and
    # cross-tile index offsets must stay global.
    x = jnp.asarray(rng.standard_normal((1, 300, 3)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((1, 700, 3)).astype(np.float32))
    _, _, i_xy, i_yx = min_dists_with_args_pallas(x, y, interpret=True)
    full = np.sum(
        (np.asarray(x)[:, :, None, :] - np.asarray(y)[:, None, :, :]) ** 2, -1
    )
    np.testing.assert_array_equal(np.asarray(i_xy), full.argmin(2))
    np.testing.assert_array_equal(np.asarray(i_yx), full.argmin(1))
    assert int(np.max(i_xy)) < 700 and int(np.max(i_yx)) < 300


def test_min_dists_vjp_gradcheck_vs_xla(rng):
    """The kernel's custom VJP must equal XLA autodiff through the dense
    min formulation — gradients scatter only to the matched pairs."""
    x = jnp.asarray(rng.standard_normal((2, 60, 3)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((2, 90, 3)).astype(np.float32))

    def loss_pallas(x, y):
        d_xy, d_yx = min_dists_vjp(x, y, interpret=True)
        # Non-uniform weights catch index-misrouting that a plain mean hides.
        wx = jnp.arange(1.0, d_xy.shape[1] + 1.0)[None, :]
        wy = jnp.arange(1.0, d_yx.shape[1] + 1.0)[None, :]
        return jnp.sum(d_xy * wx) + jnp.sum(d_yx * wy)

    def loss_xla(x, y):
        d2 = jnp.sum((x[:, :, None, :] - y[:, None, :, :]) ** 2, -1)
        wx = jnp.arange(1.0, x.shape[1] + 1.0)[None, :]
        wy = jnp.arange(1.0, y.shape[1] + 1.0)[None, :]
        return jnp.sum(jnp.min(d2, 2) * wx) + jnp.sum(jnp.min(d2, 1) * wy)

    gx_p, gy_p = jax.grad(loss_pallas, argnums=(0, 1))(x, y)
    gx_x, gy_x = jax.grad(loss_xla, argnums=(0, 1))(x, y)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_x),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gy_p), np.asarray(gy_x),
                               rtol=1e-4, atol=1e-5)


def test_chamfer_pallas_grad_matches_xla_chamfer_grad(rng):
    """End-to-end: grad of the full Pallas chamfer (normalize + sqrt + mean)
    matches grad of the metrics XLA chamfer — the VAE-training hot path."""
    x = jnp.asarray(rng.standard_normal((2, 100, 3)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((2, 128, 3)).astype(np.float32))

    g_p = jax.grad(
        lambda a: chamfer_distance_pallas(a, y, interpret=True)
    )(x)
    g_x = jax.grad(
        lambda a: metrics.chamfer_distance(a, y, use_pallas=False)
    )(x)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x),
                               rtol=1e-3, atol=1e-4)


def _force_pallas(monkeypatch):
    """Route the metrics eval path through the kernel in interpret mode
    (the CPU harness has no Mosaic TPU compiler)."""
    import functools

    from shapegen_tpu.metrics import metrics as M
    from shapegen_tpu.ops import pallas_kernels as PK

    monkeypatch.setattr(M, "_PALLAS_OVERRIDE", True)
    monkeypatch.setattr(
        PK, "min_dists_pallas", functools.partial(min_dists_pallas, interpret=True)
    )
    monkeypatch.setattr(
        PK,
        "chamfer_distance_pallas",
        functools.partial(chamfer_distance_pallas, interpret=True),
    )


def test_chamfer_distance_pallas_dispatch(rng, monkeypatch):
    """metrics.chamfer_distance auto-routes through the kernel on TPU; the
    dispatched value must match the XLA formulation."""
    x = jnp.asarray(rng.standard_normal((2, 130, 3)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((2, 90, 3)).astype(np.float32))
    want = float(metrics.chamfer_distance(x, y, use_pallas=False))
    _force_pallas(monkeypatch)
    got = float(metrics.chamfer_distance(x, y))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_pairwise_chamfer_matrix_pallas_dispatch(rng, monkeypatch):
    """The blocked Pallas pairwise matrix (incl. gen-axis padding: G=5 is
    not a multiple of block=2) must match the XLA lax.map path."""
    gen = jnp.asarray(rng.standard_normal((5, 40, 3)).astype(np.float32))
    ref = jnp.asarray(rng.standard_normal((3, 56, 3)).astype(np.float32))
    want = np.asarray(
        metrics.pairwise_chamfer_matrix(gen, ref, block=2, use_pallas=False)
    )
    _force_pallas(monkeypatch)
    got = np.asarray(metrics.pairwise_chamfer_matrix(gen, ref, block=2))
    assert got.shape == (5, 3)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_coverage_mmd_pallas_dispatch(rng, monkeypatch):
    gen = jnp.asarray(rng.standard_normal((4, 40, 3)).astype(np.float32))
    ref = jnp.asarray(rng.standard_normal((4, 40, 3)).astype(np.float32))
    cov_x, mmd_x = metrics.coverage_and_mmd(gen, ref, block=2)
    _force_pallas(monkeypatch)
    cov_p, mmd_p = metrics.coverage_and_mmd(gen, ref, block=2)
    np.testing.assert_allclose(float(cov_p), float(cov_x), atol=1e-6)
    np.testing.assert_allclose(float(mmd_p), float(mmd_x), rtol=1e-4)
