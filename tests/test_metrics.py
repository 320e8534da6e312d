"""Metric tests, incl. the reference's units.py bounds test and torch parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shapegen_tpu import metrics


def _rand_clouds(rng):
    # Reference unit test: deliberately unequal point counts (units.py:7-10).
    x = rng.standard_normal((1, 994, 3)).astype(np.float32)
    y = rng.standard_normal((1, 948, 3)).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(y)


def test_reference_units_bounds(rng):
    """Port of units.py:6-26: CD / EMD-exact / EMD-Sinkhorn each in [0, 200]."""
    x, y = _rand_clouds(rng)
    cd = float(metrics.chamfer_distance(x, y))
    assert 0 <= cd <= 200
    emd_cpu = metrics.earth_mover_distance_hungarian(x, y)
    assert 0 <= emd_cpu <= 200
    emd_gpu = float(metrics.sinkhorn_emd(x, y))
    assert 0 <= emd_gpu <= 200


def test_chamfer_identical_clouds_zero(rng):
    x = jnp.asarray(rng.standard_normal((2, 100, 3)).astype(np.float32))
    cd = float(metrics.chamfer_distance(x, x))
    assert cd < 1e-2  # sqrt eps floor only


def test_chamfer_parity_with_torch(rng):
    torch = pytest.importorskip("torch")
    x = rng.standard_normal((2, 60, 3)).astype(np.float32)
    y = rng.standard_normal((2, 80, 3)).astype(np.float32)

    # Independent torch oracle of the reference formula (metrics.py:23-47).
    def torch_cd(xt, yt):
        def norm(p):
            center = (p.max(dim=1, keepdim=True)[0] + p.min(dim=1, keepdim=True)[0]) / 2
            p = p - center
            scale = p.abs().max(dim=1, keepdim=True)[0].max(dim=2, keepdim=True)[0]
            return p / scale

        xt, yt = norm(xt), norm(yt)
        dist = torch.cdist(xt, yt)
        return (dist.min(2)[0].mean() + dist.min(1)[0].mean()) * 1e3

    want = float(torch_cd(torch.tensor(x), torch.tensor(y)))
    got = float(metrics.chamfer_distance(jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(got, want, rtol=1e-3)


def test_chamfer_masked_matches_unmasked_on_full(rng):
    x = jnp.asarray(rng.standard_normal((1, 50, 3)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((1, 40, 3)).astype(np.float32))
    full = float(metrics.chamfer_distance(x, y))
    masked = float(
        metrics.chamfer_distance_masked(
            x, jnp.ones((1, 50), bool), y, jnp.ones((1, 40), bool)
        )
    )
    np.testing.assert_allclose(masked, full, rtol=1e-4)


def test_chamfer_masked_ignores_padding(rng):
    x = rng.standard_normal((30, 3)).astype(np.float32)
    y = rng.standard_normal((25, 3)).astype(np.float32)
    xp = np.concatenate([x, np.full((10, 3), 99.0, np.float32)])
    yp = np.concatenate([y, np.full((5, 3), -99.0, np.float32)])
    xm = np.concatenate([np.ones(30, bool), np.zeros(10, bool)])
    ym = np.concatenate([np.ones(25, bool), np.zeros(5, bool)])
    want = float(metrics.chamfer_distance(jnp.asarray(x[None]), jnp.asarray(y[None])))
    got = float(
        metrics.chamfer_distance_masked(
            jnp.asarray(xp[None]), jnp.asarray(xm[None]),
            jnp.asarray(yp[None]), jnp.asarray(ym[None]),
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_hungarian_emd_permutation_invariant(rng):
    x = rng.standard_normal((1, 64, 3)).astype(np.float32)
    perm = rng.permutation(64)
    emd = metrics.earth_mover_distance_hungarian(
        jnp.asarray(x), jnp.asarray(x[:, perm])
    )
    assert emd < 1e-6


def test_pairwise_emd_matrix_separates_shapes(rng):
    """The (G, R) Sinkhorn-EMD matrix: self-pairs cost ~0 and each shape
    family's own column is its row-min (the conditional confusion-matrix
    second statistic)."""
    n = 64
    rods = np.zeros((3, n, 3), np.float32)
    rods[:, :, 0] = np.linspace(-1, 1, n)  # mass along one axis
    rods += rng.standard_normal(rods.shape).astype(np.float32) * 0.02
    balls = rng.standard_normal((3, n, 3)).astype(np.float32) * 0.5

    gen = jnp.asarray(np.concatenate([rods[:2], balls[:2]]))
    ref = jnp.asarray(np.concatenate([rods[2:], balls[2:]]))
    d = np.asarray(metrics.pairwise_emd_matrix(gen, ref))
    assert d.shape == (4, 2)
    assert np.isfinite(d).all() and (d >= 0).all()
    # Rod gens match the rod ref better; ball gens match the ball ref.
    assert d[0, 0] < d[0, 1] and d[1, 0] < d[1, 1]
    assert d[2, 1] < d[2, 0] and d[3, 1] < d[3, 0]

    # A cloud against a permutation of itself transports for ~nothing.
    perm = rng.permutation(n)
    same = np.asarray(metrics.pairwise_emd_matrix(
        gen[:1], jnp.asarray(np.asarray(gen[:1])[:, perm])
    ))
    assert same[0, 0] < 0.05


def test_sinkhorn_matches_reference_equations(rng):
    """Fidelity test: our lax.while_loop Sinkhorn reproduces the reference's
    exact update equations (metrics.py:94-158) stepped in numpy.

    NOTE the reference normalizes the cost by its *global max* and caps
    iterations at 100 with eps=1e-2 — a weak approximation whose value is on
    its own scale (can even be non-monotone in cloud separation). We
    reproduce that behavior exactly rather than "fixing" it.
    """
    x = rng.standard_normal((2, 40, 3)).astype(np.float32)
    y = rng.standard_normal((2, 48, 3)).astype(np.float32)
    got = float(metrics.sinkhorn_emd(jnp.asarray(x), jnp.asarray(y)))

    def cube(p):
        center = (p.max(1, keepdims=True) + p.min(1, keepdims=True)) / 2
        p = p - center
        return p / np.abs(p).max(axis=(1, 2), keepdims=True)

    from scipy.special import logsumexp

    xn, yn = cube(x), cube(y)
    C = np.linalg.norm(xn[:, :, None] - yn[:, None, :], axis=-1)
    C = C / C.max()
    eps, lam, thresh = 1e-2, 100.0, 1e-5
    B, n, m = C.shape[0], C.shape[1], C.shape[2]
    alpha = np.zeros((B, n, 1))
    beta = np.zeros((B, m, 1))
    log_mu = np.log(np.full((B, n, 1), 1.0 / n) + 1e-10)
    log_nu = np.log(np.full((B, m, 1), 1.0 / m) + 1e-10)
    for _ in range(100):
        a_prev, b_prev = alpha, beta
        alpha = eps * (log_mu - logsumexp(
            -lam * C + beta.transpose(0, 2, 1), axis=2, keepdims=True))
        beta = eps * (log_nu - logsumexp(
            -lam * C.transpose(0, 2, 1) + alpha.transpose(0, 2, 1),
            axis=2, keepdims=True))
        if np.abs(alpha - a_prev).max() < thresh and np.abs(beta - b_prev).max() < thresh:
            break
    P = np.exp(-lam * C + alpha + beta.transpose(0, 2, 1))
    want = float((P * C).sum(axis=(1, 2)).mean())
    np.testing.assert_allclose(got, want, rtol=1e-3)


def test_compute_metrics_triple(rng):
    x = jnp.asarray(rng.standard_normal((1, 64, 3)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((1, 64, 3)).astype(np.float32))
    cd, emd, recon = metrics.compute_metrics(x, y)
    assert float(cd) > 0 and emd > 0 and float(recon) > 0
    cd2, emd2, _ = metrics.compute_metrics(x, y, use_approximate_gpu_emd=True)
    assert float(cd2) == float(cd)


def test_compute_metrics_batched_matches_sequential(rng):
    """The batched/overlapped eval path (one jitted device program + host
    Hungarian overlap) returns the same per-pair values as the reference's
    sequential pair-by-pair compute_metrics loop (test_point_ddpm.py:85-97)."""
    x = jnp.asarray(rng.standard_normal((4, 48, 3)).astype(np.float32))
    y = jnp.asarray((rng.standard_normal((4, 48, 3)) * 0.8).astype(np.float32))

    cds, emds, recons = metrics.compute_metrics_batched(x, y)
    assert cds.shape == emds.shape == recons.shape == (4,)
    for i in range(4):
        cd, emd, rec = metrics.compute_metrics(x[i], y[i])
        np.testing.assert_allclose(cds[i], float(cd), rtol=1e-5)
        np.testing.assert_allclose(emds[i], float(emd), rtol=1e-5)
        np.testing.assert_allclose(recons[i], float(rec), rtol=1e-5)

    # Sinkhorn variant: the batched call normalizes costs per pair, matching
    # what sequential B=1 calls compute; batched convergence may run a few
    # extra sub-threshold iterations, hence the looser bound.
    _, emds2, _ = metrics.compute_metrics_batched(
        x, y, use_approximate_gpu_emd=True
    )
    for i in range(4):
        _, emd, _ = metrics.compute_metrics(
            x[i], y[i], use_approximate_gpu_emd=True
        )
        np.testing.assert_allclose(emds2[i], float(emd), rtol=1e-3, atol=1e-5)


def test_focal_loss_matches_reference_formula(rng):
    pred = jnp.asarray(rng.random((2, 8, 8, 8)).astype(np.float32))
    target = jnp.asarray((rng.random((2, 8, 8, 8)) > 0.7).astype(np.float32))
    got = float(metrics.voxel_focal_loss(pred, target))
    p = np.clip(np.asarray(pred), 1e-7, 1 - 1e-7)
    t = np.asarray(target)
    bce = -t * np.log(p) - (1 - t) * np.log(1 - p)
    pt = np.where(t == 1, p, 1 - p)
    fl = np.where(t == 1, 0.25, 0.75) * (1 - pt) ** 2 * bce
    np.testing.assert_allclose(got, fl.mean(), rtol=1e-5)


def test_coverage_mmd_and_1nna(rng):
    ref = jnp.asarray(rng.standard_normal((6, 32, 3)).astype(np.float32))
    # Generated identical to reference: perfect coverage, ~zero MMD.
    cov, mmd = metrics.coverage_and_mmd(ref, ref, block=2)
    assert float(cov) == 1.0
    assert float(mmd) < 1e-2
    acc = metrics.one_nna(ref + 1e-5, ref, block=4)
    # Indistinguishable sets -> near-zero accuracy (each cloud's NN is its twin
    # from the other set).
    assert float(acc) <= 0.2
    # Clearly distinct shape families (sphere shells vs flat disks) -> ~1.
    shells = np.asarray(ref) / np.linalg.norm(np.asarray(ref), axis=-1, keepdims=True)
    disks = rng.standard_normal((6, 32, 3)).astype(np.float32)
    disks[..., 2] *= 0.01
    acc_far = metrics.one_nna(jnp.asarray(disks), jnp.asarray(shells), block=4)
    assert float(acc_far) >= 0.9


def test_hungarian_threaded_matches_sequential(rng):
    """The pair-parallel Hungarian (ThreadPoolExecutor over GIL-releasing
    scipy solves) returns exactly what the sequential loop returns."""
    from shapegen_tpu.metrics.metrics import _hungarian_pairs_host

    x = rng.standard_normal((5, 40, 3)).astype(np.float32)
    y = rng.standard_normal((5, 40, 3)).astype(np.float32)
    seq = _hungarian_pairs_host(x, y, workers=1)
    par = _hungarian_pairs_host(x, y, workers=4)
    np.testing.assert_array_equal(seq, par)


def test_pairwise_exact_emd_matrix_backends_agree():
    """The exact-EMD confusion-matrix helper: host Hungarian and device
    auction backends agree with each other and with per-pair
    earth_mover_distance_hungarian on the same (cube-normalized) clouds."""
    import jax

    rng = np.random.default_rng(11)
    gen = rng.standard_normal((3, 48, 3)).astype(np.float32)
    ref = rng.standard_normal((4, 48, 3)).astype(np.float32)

    host = metrics.pairwise_exact_emd_matrix(gen, ref, backend="host")
    dev = metrics.pairwise_exact_emd_matrix(gen, ref, backend="device")
    assert host.shape == dev.shape == (3, 4)
    np.testing.assert_allclose(host, dev, rtol=1e-4, atol=1e-5)

    # Spot-check one entry against the public per-pair oracle (which
    # cube-normalizes internally, like the matrix helper).
    want = metrics.earth_mover_distance_hungarian(gen[1:2], ref[2:3])
    assert host[1, 2] == pytest.approx(want, rel=1e-6)


def test_compute_metrics_batched_device_exact_backend():
    """compute_metrics_batched(exact_emd_backend='device') routes the exact
    EMD through the auction solver and matches the host Hungarian path."""
    rng = np.random.default_rng(2)
    gen = rng.standard_normal((3, 64, 3)).astype(np.float32)
    ref = rng.standard_normal((3, 64, 3)).astype(np.float32)
    c1, e1, r1 = metrics.compute_metrics_batched(gen, ref,
                                                 exact_emd_backend="host")
    c2, e2, r2 = metrics.compute_metrics_batched(gen, ref,
                                                 exact_emd_backend="device")
    np.testing.assert_allclose(c1, c2)
    np.testing.assert_allclose(r1, r2)
    np.testing.assert_allclose(e1, e2, rtol=1e-3, atol=64 * 1e-5)
