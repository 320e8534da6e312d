"""Training-dynamics parity vs torch: loss, gradients, optimizer update,
and BatchNorm running-stat update must all match the reference's torch
semantics with shared weights on identical data.

The forward transplant tests prove inference equivalence; these prove the
*train step* — the thing that determines whether this framework trains like
the reference:

  * PointUNetLarge + L1 eps-loss + AdamW(lr=1e-4, wd=1e-5)
    (reference diffusion.py:56-86: configure_optimizers + training_step)
  * VAE3DLarge + BCE(mean) + beta*KL(mean) + Adam(lr=1e-4), train-mode
    BatchNorm batch-stats (reference networks.py:2285-2297, 2372-2403)

Both tests run in float64 on both sides (torch .double() / jax.enable_x64):
in f32, train-mode BatchNorm normalization amplifies rounding differences
through the deep stacks to percent level, which would force tolerances loose
enough to hide real semantic bugs. In f64 any momentum/epsilon/decay
-placement difference would show up many orders of magnitude above the
noise floor.

Structurally-zero gradients: every Dense/Conv bias whose output feeds a
BatchNorm through purely linear ops has mathematically ZERO gradient (BN
subtracts the batch mean, so a constant shift is a no-op). The reference
keeps these redundant parameters (Conv1d(bias=True) before BN everywhere),
so we keep them for checkpoint compatibility — but their "gradients" are
pure rounding residue in both frameworks. The tests assert near-zero on
both sides for those leaves and compare all others tightly.

Each test checks, in order: (1) train-mode loss, (2) per-leaf gradients,
(3) the optimizer update in isolation (optax step driven by the TORCH
grads must land on torch's updated params — pins AdamW/Adam math), and
(4) the end-to-end updated params from the real jax step.
(5, PointUNet only) BatchNorm running stats: identical means; variance
matches after converting torch's unbiased (Bessel n/(n-1)) batch variance
to flax's biased one — at production sizes n >= 32768 the two differ by
3e-5 relative, which is negligible and documented here.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from shapegen_tpu import models  # noqa: E402
from shapegen_tpu.models.vae3d import kl_divergence_mean  # noqa: E402
from shapegen_tpu.train.state import make_adam, make_adamw  # noqa: E402
from transplant_utils import (  # noqa: E402
    PointUNetOracle,
    VAE3DOracle,
    get_grads,
    pointunet_trees,
    vae3d_trees,
)

DIM = 32
LATENT = 8


@pytest.fixture
def x64():
    with jax.enable_x64(True):
        yield


def get_weights64(p):
    return p.detach().numpy().copy()


def _leaf_items(tree):
    leaves, _ = jax.tree_util.tree_flatten_with_path(tree)
    return [(jax.tree_util.keystr(path), leaf) for path, leaf in leaves]


def assert_grads_match(grads_j, grads_t, is_zero, rtol, scale_floor=1e-7):
    """Compare gradient trees leaf-for-leaf.

    Leaves for which ``is_zero(key)`` holds are structurally zero (bias
    absorbed by a downstream BatchNorm): assert near-zero on BOTH sides
    instead of comparing noise against noise.
    """
    items_j = _leaf_items(grads_j)
    items_t = _leaf_items(grads_t)
    assert [k for k, _ in items_j] == [k for k, _ in items_t]
    gscale = max(
        float(np.max(np.abs(np.asarray(leaf)))) for _, leaf in items_t
    )
    checked_zero = 0
    for (key, gj), (_, gt) in zip(items_j, items_t):
        gj, gt = np.asarray(gj), np.asarray(gt)
        if is_zero(key):
            bound = scale_floor * gscale
            assert np.max(np.abs(gt)) < bound, f"{key}: torch grad not ~0"
            assert np.max(np.abs(gj)) < bound, f"{key}: jax grad not ~0"
            checked_zero += 1
            continue
        # Noise floor: the flax models' f32 output/latent heads seed ~1e-7
        # relative noise into the otherwise-f64 backward pass.
        atol = 1e-7 * max(gscale, float(np.max(np.abs(gt))))
        np.testing.assert_allclose(gj, gt, rtol=rtol, atol=atol, err_msg=key)
    assert checked_zero > 0, "zero-grad markers matched no leaves"


def assert_updates_match(params0, updated_j, updated_t, lr, is_zero):
    """Updated-params comparison (end-to-end sanity on top of the exact
    checks 2+3). Adam's first-step update is ~sign(g)*lr, so elements whose
    true gradient sits at the cancellation-noise floor get a noisy update in
    BOTH frameworks by design — tolerate a fraction of lr per element.
    Structurally-zero-grad leaves random-walk at +-lr per step off gradient
    noise (identically so in the reference's torch training), so their
    post-step values are only bounded."""
    items_0 = _leaf_items(params0)
    items_j = _leaf_items(updated_j)
    items_t = _leaf_items(updated_t)
    for (key, p0), (_, pj), (_, pt) in zip(items_0, items_j, items_t):
        p0, pj, pt = np.asarray(p0), np.asarray(pj), np.asarray(pt)
        bound = 2.0 * lr * (1 + np.max(np.abs(p0)))
        if is_zero(key):
            assert np.max(np.abs(pj - p0)) < bound, key
            assert np.max(np.abs(pt - p0)) < bound, key
            continue
        # atol = lr: elements whose true grad sits at the noise floor get a
        # partially-flipped ~sign(g)*lr Adam step; a systematic error would
        # move MANY elements by up to 2*lr, caught here and in checks 2-3.
        np.testing.assert_allclose(pj, pt, rtol=0, atol=1.0 * lr, err_msg=key)


def _cosine_rates(t: np.ndarray):
    start, end = np.arccos(0.95), np.arccos(0.02)
    ang = start + t * (end - start)
    return np.sin(ang), np.cos(ang)


def pointunet_is_zero_grad(key: str) -> bool:
    """Bias leaves absorbed by a downstream BatchNorm in PointUNetLarge:
    the time-MLP's second Dense (a uniform shift removed by enc1's BN; its
    FIRST Dense feeds SiLU, nonlinear, so its grad is real), every refine
    Dense, the split dec4 rung's biased branch, and every DenseBN rung's
    Dense (inside or outside PointNetLayers)."""
    if key == "['TimeMLP_0']['Dense_1']['bias']":
        return True
    if key in {
        "['Dense_0']['bias']", "['Dense_1']['bias']", "['Dense_2']['bias']",
        "['Dense_3']['bias']", "['Dense_5']['bias']",
    }:
        return True
    return "DenseBN_" in key and key.endswith("['Dense_0']['bias']")


def vae3d_is_zero_grad(key: str) -> bool:
    """VAE3DLarge: residual-block convs c1/c2 feed their BNs directly (the
    Conv_2 shortcut and all non-res-block convs feed ReLU/etc — real)."""
    return key.endswith("['Conv_0']['bias']") or key.endswith(
        "['Conv_1']['bias']"
    )


def test_pointunet_l1_adamw_step_matches_torch(rng, x64):
    torch.manual_seed(24)
    oracle = PointUNetOracle(dim=DIM, time_dim=DIM).double()
    oracle.train()

    B, N = 4, 64
    x0 = rng.standard_normal((B, N, 3))
    t = np.array([0.1, 0.35, 0.6, 0.9])
    eps = rng.standard_normal((B, N, 3))
    noise_rates, signal_rates = _cosine_rates(t)
    x_t = signal_rates[:, None, None] * x0 + noise_rates[:, None, None] * eps

    params0, stats0 = pointunet_trees(oracle, get_weights64)
    old_running_var = oracle.enc1[1].running_var.numpy().copy()

    # --- torch step: L1(eps, pred) + AdamW (diffusion.py:56-86) ---
    opt = torch.optim.AdamW(oracle.parameters(), lr=1e-4, weight_decay=1e-5)
    pred_t = oracle(torch.tensor(x_t), torch.tensor(t))
    loss_t = torch.nn.functional.l1_loss(torch.tensor(eps), pred_t)
    opt.zero_grad()
    loss_t.backward()
    grads_t, _ = pointunet_trees(oracle, get_grads)
    opt.step()
    updated_t, _ = pointunet_trees(oracle, get_weights64)

    # --- jax step ---
    model = models.PointUNetLarge(dim=DIM, time_dim=DIM, dtype=jnp.float64)

    def loss_fn(params):
        pred, mutated = model.apply(
            {"params": params, "batch_stats": stats0},
            jnp.asarray(x_t), jnp.asarray(t), train=True,
            mutable=["batch_stats"],
        )
        loss = jnp.mean(jnp.abs(jnp.asarray(eps) - pred))
        return loss, mutated["batch_stats"]

    (loss_j, new_stats), grads_j = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True)
    )(params0)

    # (1) loss parity. (The flax model's output head computes in f32 by
    # design — see models/point_unet.py — which bounds agreement at ~1e-7.)
    np.testing.assert_allclose(float(loss_j), float(loss_t.detach()), rtol=1e-6)

    # (2) gradient parity, leaf for leaf. rtol covers cancellation noise
    # seeded by the f32 output head; any semantic difference would be
    # orders of magnitude larger.
    assert_grads_match(grads_j, grads_t, pointunet_is_zero_grad, rtol=5e-3)

    # (3) optimizer math in isolation: optax AdamW driven by the TORCH
    # grads must land exactly on torch's updated params (all leaves).
    tx = make_adamw(1e-4)
    upd, _ = tx.update(grads_t, tx.init(params0), params0)
    from_torch_grads = optax.apply_updates(params0, upd)
    for (key, a), (_, b) in zip(
        _leaf_items(from_torch_grads), _leaf_items(updated_t)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-9, atol=1e-12, err_msg=key
        )

    # (4) end-to-end: the real jax step lands on torch's updated params.
    upd_j, _ = tx.update(grads_j, tx.init(params0), params0)
    updated_j = optax.apply_updates(params0, upd_j)
    assert_updates_match(
        params0, updated_j, updated_t, 1e-4, pointunet_is_zero_grad
    )

    # (5) BatchNorm running stats.
    n = B * N
    got = new_stats["PointNetLayer_0"]["DenseBN_0"]["BatchNorm_0"]
    new_mean_t = oracle.enc1[1].running_mean.numpy()
    new_var_t = oracle.enc1[1].running_var.numpy()
    # flax keeps running stats in f32 (force_float32_reductions default), so
    # agreement with torch's f64 stats is bounded by f32 precision.
    np.testing.assert_allclose(
        np.asarray(got["mean"]), new_mean_t, rtol=1e-5, atol=1e-8
    )
    batch_var_unbiased = (new_var_t - 0.9 * old_running_var) / 0.1
    want_var = 0.9 * old_running_var + 0.1 * batch_var_unbiased * (n - 1) / n
    np.testing.assert_allclose(
        np.asarray(got["var"]), want_var, rtol=1e-5, atol=1e-8
    )


def test_pointunet_lockstep_trajectory_matches_torch(rng, x64):
    """15 CONSECUTIVE f64 train steps vs torch with shared data: Adam moments
    and BatchNorm running stats evolve on both sides, and the per-step losses
    must stay in agreement. Any momentum/decay/BN-momentum placement error
    compounds exponentially over a trajectory and would blow far past these
    bounds within a few steps; what remains is cancellation noise seeded by
    the flax model's f32 output head (amplified ~per step through Adam's
    sign(g)-like first-step behavior on noise-floor gradients).
    (Reference: diffusion.py:56-86 train step, networks.py exact layers.)
    """
    torch.manual_seed(24)
    oracle = PointUNetOracle(dim=DIM, time_dim=DIM).double()
    oracle.train()

    B, N, STEPS = 4, 64, 15
    params, stats = pointunet_trees(oracle, get_weights64)
    opt_t = torch.optim.AdamW(oracle.parameters(), lr=1e-4, weight_decay=1e-5)

    model = models.PointUNetLarge(dim=DIM, time_dim=DIM, dtype=jnp.float64)
    tx = make_adamw(1e-4)
    opt_state = tx.init(params)

    @jax.jit
    def jax_step(params, stats, opt_state, x_t, t, eps):
        def loss_fn(p):
            pred, mutated = model.apply(
                {"params": p, "batch_stats": stats},
                x_t, t, train=True, mutable=["batch_stats"],
            )
            return jnp.mean(jnp.abs(eps - pred)), mutated["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params
        )
        upd, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, upd), new_stats, opt_state2, loss

    losses_j, losses_t = [], []
    for i in range(STEPS):
        x0 = rng.standard_normal((B, N, 3))
        t = rng.random(B)
        eps = rng.standard_normal((B, N, 3))
        nr, sr = _cosine_rates(t)
        x_t = sr[:, None, None] * x0 + nr[:, None, None] * eps

        pred_t = oracle(torch.tensor(x_t), torch.tensor(t))
        loss_t = torch.nn.functional.l1_loss(torch.tensor(eps), pred_t)
        opt_t.zero_grad()
        loss_t.backward()
        opt_t.step()
        losses_t.append(float(loss_t.detach()))

        params, stats, opt_state, loss_j = jax_step(
            params, stats, opt_state,
            jnp.asarray(x_t), jnp.asarray(t), jnp.asarray(eps),
        )
        losses_j.append(float(loss_j))

    losses_j, losses_t = np.asarray(losses_j), np.asarray(losses_t)
    # Per-step agreement with a noise budget growing along the trajectory:
    # measured divergence stays ~1e-6 relative at step 15; a factor-1000
    # margin still catches any real semantic difference (which produces
    # percent-level divergence within ~3 steps).
    for i in range(STEPS):
        np.testing.assert_allclose(
            losses_j[i], losses_t[i], rtol=1e-3, err_msg=f"step {i}"
        )
    # Training must actually have progressed (the trajectory is not static).
    assert not np.allclose(losses_t[0], losses_t[-1], rtol=1e-3)

    # Final BN running stats still agree after 15 momentum updates.
    got = stats["PointNetLayer_0"]["DenseBN_0"]["BatchNorm_0"]
    np.testing.assert_allclose(
        np.asarray(got["mean"]), oracle.enc1[1].running_mean.numpy(),
        rtol=1e-4, atol=1e-7,
    )


def test_plateau_scheduler_sequence_matches_torch():
    """ReduceLROnPlateau stepped over a recorded loss sequence produces the
    exact LR sequence torch produces (rel-threshold mode, patience handling,
    post-reduction reset) — diffusion.py:56-68 semantics."""
    from shapegen_tpu.train.schedulers import ReduceLROnPlateau

    losses = [
        1.0, 0.9, 0.85, 0.849, 0.848, 0.848, 0.848, 0.848, 0.848, 0.848,
        0.847, 0.5, 0.5, 0.5, 0.5, 0.5, 0.5, 0.5, 0.51, 0.49, 0.489,
        0.4888, 0.48878, 0.48878, 0.48878, 0.48878, 0.48878, 0.48878,
    ]
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.AdamW([p], lr=1e-4)
    sched_t = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, factor=0.5, patience=5
    )
    sched_j = ReduceLROnPlateau(1e-4, factor=0.5, patience=5)

    lrs_t, lrs_j = [], []
    for v in losses:
        sched_t.step(v)
        lrs_t.append(opt.param_groups[0]["lr"])
        lrs_j.append(sched_j.step(v))
    np.testing.assert_allclose(lrs_j, lrs_t, rtol=0, atol=0)
    assert lrs_t[-1] < 1e-4  # the sequence actually exercises reductions


def test_cosine_scheduler_sequence_matches_torch():
    """CosineAnnealingLR(T_max, eta_min=1e-6) epoch sequence parity
    (diffusion.py:410-423)."""
    from shapegen_tpu.train.schedulers import CosineAnnealingLR

    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.AdamW([p], lr=1e-4)
    sched_t = torch.optim.lr_scheduler.CosineAnnealingLR(
        opt, T_max=50, eta_min=1e-6
    )
    sched_j = CosineAnnealingLR(1e-4, t_max=50, eta_min=1e-6)
    lrs_t, lrs_j = [], []
    for _ in range(50):
        sched_t.step()
        lrs_t.append(opt.param_groups[0]["lr"])
        lrs_j.append(sched_j.step())
    np.testing.assert_allclose(lrs_j, lrs_t, rtol=1e-12)


def test_vae3d_large_bce_kl_adam_step_matches_torch(rng, x64):
    torch.manual_seed(24)
    oracle = VAE3DOracle(latent_dim=LATENT).double()
    oracle.train()

    B = 1
    x = (rng.random((B, 32, 32, 32, 1)) > 0.7).astype(np.float64)
    e = rng.standard_normal((B, LATENT))
    kl_w = 0.06  # epoch-5 warmup weight ((5+1)/10 * 0.1), networks.py:2355-2370

    params0, stats0 = vae3d_trees(oracle, get_weights64)

    # --- torch step (networks.py:2372-2403 train path, fixed reparam eps) ---
    x_cf = torch.tensor(x).permute(0, 4, 1, 2, 3)
    opt = torch.optim.Adam(oracle.parameters(), lr=1e-4)
    mu_t, logvar_t = oracle.encode(x_cf)
    z_t = mu_t + torch.tensor(e) * torch.exp(0.5 * logvar_t)
    logits_t = oracle.decode_logits(z_t)
    bce_t = torch.nn.functional.binary_cross_entropy_with_logits(
        logits_t, x_cf, reduction="mean"
    )
    kl_t = -0.5 * torch.mean(1 + logvar_t - mu_t.pow(2) - logvar_t.exp())
    loss_t = bce_t + kl_w * kl_t
    opt.zero_grad()
    loss_t.backward()
    grads_t, _ = vae3d_trees(oracle, get_grads)
    opt.step()
    updated_t, _ = vae3d_trees(oracle, get_weights64)

    # --- jax step ---
    model = models.VAE3DLarge(latent_dim=LATENT, dtype=jnp.float64)

    def loss_fn(params):
        (mu, logvar), mut1 = model.apply(
            {"params": params, "batch_stats": stats0},
            jnp.asarray(x), train=True, mutable=["batch_stats"],
            method=model.encode,
        )
        z = mu + jnp.asarray(e) * jnp.exp(0.5 * logvar)
        # encoder/decoder submodules are disjoint top-level keys, so a
        # shallow merge carries the encoder's fresh stats forward.
        stats_mid = {**stats0, **mut1["batch_stats"]}
        logits, _ = model.apply(
            {"params": params, "batch_stats": stats_mid},
            z, train=True, mutable=["batch_stats"],
            method=model.decode_logits,
        )
        bce = jnp.mean(
            optax.sigmoid_binary_cross_entropy(logits, jnp.asarray(x))
        )
        return bce + kl_w * kl_divergence_mean(mu, logvar)

    loss_j, grads_j = jax.jit(jax.value_and_grad(loss_fn))(params0)

    # rtol 1e-5: the flax model computes its latent heads and output logits
    # in f32 by design (models/vae3d.py), which bounds f64 loss agreement.
    np.testing.assert_allclose(float(loss_j), float(loss_t.detach()), rtol=1e-5)
    assert_grads_match(grads_j, grads_t, vae3d_is_zero_grad, rtol=5e-3)

    tx = make_adam(1e-4)
    upd, _ = tx.update(grads_t, tx.init(params0), params0)
    from_torch_grads = optax.apply_updates(params0, upd)
    for (key, a), (_, b) in zip(
        _leaf_items(from_torch_grads), _leaf_items(updated_t)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-9, atol=1e-12, err_msg=key
        )

    upd_j, _ = tx.update(grads_j, tx.init(params0), params0)
    updated_j = optax.apply_updates(params0, upd_j)
    assert_updates_match(
        params0, updated_j, updated_t, 1e-4, vae3d_is_zero_grad
    )
