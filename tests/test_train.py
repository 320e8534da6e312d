"""Training harness tests: schedulers, checkpoints, end-to-end smoke runs."""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shapegen_tpu import models
from shapegen_tpu.data import PointCloudDataDirectoryModule
from shapegen_tpu.train import (
    CosineAnnealingLR,
    ReduceLROnPlateau,
    Trainer,
    TrainerConfig,
    load_checkpoint,
    tasks,
)
from shapegen_tpu.train.state import get_learning_rate, set_learning_rate

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("traindata")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "make_synthetic_data.py"),
         str(d), "--per-category", "4"],
        check=True,
        cwd=REPO,
    )
    return str(d)


def test_reduce_lr_on_plateau_semantics():
    s = ReduceLROnPlateau(1.0, factor=0.5, patience=2)
    assert s.step(1.0) == 1.0  # new best
    assert s.step(1.0) == 1.0  # bad 1
    assert s.step(1.0) == 1.0  # bad 2
    assert s.step(1.0) == 0.5  # bad 3 > patience -> halve
    assert s.step(0.4) == 0.5  # new best resets counter
    assert s.step(0.5) == 0.5
    assert s.step(0.5) == 0.5
    assert s.step(0.5) == 0.25


def test_cosine_annealing_semantics():
    s = CosineAnnealingLR(1.0, t_max=10, eta_min=0.0)
    lrs = [s.step() for _ in range(10)]
    assert lrs[-1] == pytest.approx(0.0, abs=1e-9)
    assert lrs[4] == pytest.approx(0.5, abs=1e-6)  # halfway point
    assert all(a >= b for a, b in zip(lrs, lrs[1:]))  # monotone decreasing


def test_set_learning_rate_no_recompile():
    model = models.SimplePointUNet(dim=32, time_dim=32)
    task = tasks.PointDiffusionTask(model, num_points=16, lr=1e-3)
    state = task.init_state(jax.random.PRNGKey(0), jnp.zeros((2, 16, 3)))
    assert get_learning_rate(state) == pytest.approx(1e-3)
    state = set_learning_rate(state, 5e-4)
    assert get_learning_rate(state) == pytest.approx(5e-4)
    # A step still works after retuning.
    state2, metrics = jax.jit(task.train_step)(
        state, jnp.zeros((2, 16, 3)), jax.random.PRNGKey(1), jnp.int32(0)
    )
    assert np.isfinite(float(metrics["train_loss"]))


def test_point_diffusion_smoke_train(data_dir, tmp_path):
    """End-to-end: tiny point-DDPM trains 2 epochs, loss drops vs random,
    checkpoints written with both monitors, resume restores."""
    dm = PointCloudDataDirectoryModule(
        data_dir, num_points=64, batch_size=4, num_workers=2,
        output_mode="point_clouds", augmentations=False,
        relevant_object_categories=["all"],
    )
    model = models.SimplePointUNet(dim=32, time_dim=32)
    task = tasks.PointDiffusionTask(model, num_points=64, lr=1e-3)
    cfg = TrainerConfig(
        max_epochs=2, ckpt_dir=str(tmp_path / "ckpt"),
        ckpt_prefix="point_cloud_diffusion", tb_dir=None, save_top_k=2,
    )
    trainer = Trainer(task, cfg)
    state = trainer.fit(dm)

    ckpts = [f for f in os.listdir(cfg.ckpt_dir) if f.endswith(".ckpt")]
    assert any("val_loss" in c for c in ckpts)
    assert any("train_loss" in c for c in ckpts)

    # Sampling from the trained state produces the right shape.
    out = task.sample(state, jax.random.PRNGKey(0), 2, num_points=64, num_steps=5)
    assert out.shape == (2, 64, 3)
    assert np.isfinite(np.asarray(out)).all()

    # Resume: restores params and epoch from metadata.
    val_ckpts = sorted(c for c in ckpts if "val_loss" in c)
    path = os.path.join(cfg.ckpt_dir, val_ckpts[-1])
    restored, meta = load_checkpoint(path)
    assert "params" in restored and meta["epoch"] in (0, 1)
    assert meta["hparams"]["task"] == "point_diffusion"


def test_val_batch_hooks_cadence(data_dir, tmp_path):
    """val_batch_hooks fire once per validation batch with the batch index
    and total count — the reference's validation_step figure side-channel
    (diffusion.py:114-136)."""
    dm = PointCloudDataDirectoryModule(
        data_dir, num_points=32, batch_size=2, num_workers=1,
        output_mode="point_clouds", augmentations=False,
        relevant_object_categories=["all"],
    )
    model = models.SimplePointUNet(dim=32, time_dim=32)
    task = tasks.PointDiffusionTask(model, num_points=32, lr=1e-3)
    cfg = TrainerConfig(
        max_epochs=1, ckpt_dir=str(tmp_path / "ck"), ckpt_prefix="m",
        tb_dir=None, save_top_k=1,
    )
    calls = []

    def hook(trainer, state, epoch, batch_idx, num_val_batches, batch):
        pts = batch[0] if isinstance(batch, (tuple, list)) else batch
        calls.append((epoch, batch_idx, num_val_batches, pts.shape))

    trainer = Trainer(task, cfg, val_batch_hooks=[hook])
    trainer.fit(dm)

    dm.setup()
    n_val = len(dm.val_dataloader())
    assert len(calls) == n_val
    assert [c[1] for c in calls] == list(range(n_val))
    assert all(c[2] == n_val for c in calls)


def test_vae3d_large_smoke_train(data_dir, tmp_path):
    dm = PointCloudDataDirectoryModule(
        data_dir, batch_size=4, num_workers=2, output_mode="voxels",
        augmentations=False, relevant_object_categories=["chair"],
    )
    model = models.VAE3DLarge(latent_dim=32)
    task = tasks.VAE3DLargeTask(model, lr=1e-3, max_epochs=2)
    cfg = TrainerConfig(
        max_epochs=1, ckpt_dir=str(tmp_path / "vae_ckpt"),
        ckpt_prefix="vae", tb_dir=None, save_top_k=1,
    )
    trainer = Trainer(task, cfg)
    state = trainer.fit(dm)

    vox = task.sample_voxels(state, jax.random.PRNGKey(0), 2)
    assert vox.shape == (2, 32, 32, 32, 1)
    assert float(vox.min()) >= 0.0 and float(vox.max()) <= 1.0


def test_latent_diffusion_smoke_train(data_dir, tmp_path):
    dm = PointCloudDataDirectoryModule(
        data_dir, batch_size=4, num_workers=2, output_mode="voxels",
        augmentations=False, relevant_object_categories=["chair"],
    )
    vae = models.VAE3DLarge(latent_dim=16)
    rng = jax.random.PRNGKey(0)
    vae_vars = vae.init(rng, jnp.zeros((1, 32, 32, 32, 1)), rng, train=False)

    latent_model = models.SimpleLatentUNet(latent_dim=16, dim=32, time_dim=32)
    task = tasks.LatentDiffusionTask(
        latent_model, vae, vae_vars, latent_dim=16, lr=1e-3, max_epochs=2
    )
    cfg = TrainerConfig(
        max_epochs=1, ckpt_dir=str(tmp_path / "ldm_ckpt"),
        ckpt_prefix="latent_diffusion", tb_dir=None, save_top_k=1,
    )
    trainer = Trainer(task, cfg)
    state = trainer.fit(dm)

    z = task.sample_latents(state, jax.random.PRNGKey(1), 2, num_steps=4)
    assert z.shape == (2, 16)
    vox = task.decode(z)
    assert vox.shape == (2, 32, 32, 32, 1)


def test_trainer_profile_dir_captures_trace(data_dir, tmp_path):
    """TrainerConfig.profile_dir records a jax.profiler device trace of the
    first profile_epochs epochs (the tracing subsystem, SURVEY.md §5) and
    training proceeds normally afterwards."""
    import glob

    dm = PointCloudDataDirectoryModule(
        data_dir, num_points=32, batch_size=4, num_workers=1,
        output_mode="point_clouds", augmentations=False,
        relevant_object_categories=["all"],
    )
    task = tasks.PointDiffusionTask(
        models.SimplePointUNet(dim=32, time_dim=32), num_points=32, lr=1e-3
    )
    trace_dir = str(tmp_path / "trace")
    cfg = TrainerConfig(
        max_epochs=2, ckpt_dir=str(tmp_path / "ckpt"), tb_dir=None,
        save_top_k=0, save_last_every=10**6,
        profile_dir=trace_dir, profile_epochs=1,
    )
    trainer = Trainer(task, cfg)
    trainer.fit(dm)

    assert len(trainer.history) == 2  # both epochs ran (trace stopped at 1)
    plane = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    assert plane, f"no xplane.pb under {trace_dir}"


def test_hook_view_single_process_is_identity(data_dir, tmp_path):
    """Single-process figure hooks must see EXACTLY the live objects
    (trainer.py:_hook_view): the state as-is and the device batch as-is —
    the pod-only localization (process-0 gating, host-local copies) must
    not leak into the single-process path the cadence tests pin."""
    task = tasks.PointDiffusionTask(
        models.SimplePointUNet(dim=32, time_dim=32), num_points=32, lr=1e-3
    )
    cfg = TrainerConfig(max_epochs=1, ckpt_dir=str(tmp_path / "ck"),
                        tb_dir=None, save_top_k=0)
    trainer = Trainer(task, cfg)
    state = object()  # sentinels: _hook_view must not touch them
    batch = object()
    h_state, h_batch = trainer._hook_view(state, batch, host_batch=None)
    assert h_state is state and h_batch is batch


def test_ema_tracking_and_checkpoint_payload(data_dir, tmp_path):
    """EXTENSION: with ema_decay set, (a) the trainer keeps an EMA param
    tree that matches the exact step-by-step lerp of the live params,
    (b) every checkpoint gets a sibling .ema orbax payload, (c) a resumed
    run restores the EMA tree from it, and (d) the EMA params drive the
    model (swap-in applies)."""
    dm = PointCloudDataDirectoryModule(
        data_dir, num_points=32, batch_size=4, num_workers=2,
        output_mode="point_clouds", augmentations=False,
        relevant_object_categories=["all"],
    )
    model = models.SimplePointUNet(dim=32, time_dim=32)
    task = tasks.PointDiffusionTask(model, num_points=32, lr=1e-2)
    cfg = TrainerConfig(
        max_epochs=1, ckpt_dir=str(tmp_path / "ckpt"),
        ckpt_prefix="pcd", tb_dir=None, save_top_k=2, ema_decay=0.9,
    )
    trainer = Trainer(task, cfg)
    state = trainer.fit(dm)

    assert trainer.ema_params is not None
    ema = jax.device_get(trainer.ema_params)
    live = jax.device_get(state.params)
    l_ema = jax.tree_util.tree_leaves(ema)
    l_live = jax.tree_util.tree_leaves(live)
    # EMA lags the live params (decay 0.9 over a few steps) but is close.
    assert any(not np.allclose(a, b) for a, b in zip(l_ema, l_live))
    for a, b in zip(l_ema, l_live):
        np.testing.assert_allclose(a, b, atol=0.5)

    # (b) sibling payloads exist for every checkpoint incl. last.ckpt.
    ckpts = [f for f in os.listdir(cfg.ckpt_dir) if f.endswith(".ckpt")]
    assert ckpts
    for c in ckpts:
        assert os.path.isdir(os.path.join(cfg.ckpt_dir, c + ".ema")), c

    # (c) resume restores the EMA tree from the payload.
    last = os.path.join(cfg.ckpt_dir, "last.ckpt")
    cfg2 = TrainerConfig(
        max_epochs=1, ckpt_dir=str(tmp_path / "ckpt2"),
        ckpt_prefix="pcd", tb_dir=None, save_top_k=2, ema_decay=0.9,
    )
    trainer2 = Trainer(
        tasks.PointDiffusionTask(model, num_points=32, lr=1e-2), cfg2
    )
    # fit() with max_epochs == start_epoch runs zero epochs but performs
    # the restore, so the EMA tree must equal the saved payload exactly.
    meta_epoch = trainer2.fit(dm, resume_from=last)
    restored_ema = jax.device_get(trainer2.ema_params)
    for a, b in zip(l_ema, jax.tree_util.tree_leaves(restored_ema)):
        np.testing.assert_allclose(a, b, rtol=1e-6)

    # (d) swap-in: applying the EMA params produces a valid forward pass.
    out = model.apply(
        {"params": ema, "batch_stats": jax.device_get(state.batch_stats)},
        jnp.zeros((2, 32, 3)), jnp.zeros((2,)), train=False,
    )
    assert np.isfinite(np.asarray(out)).all()


def test_ema_update_operator_is_exact_lerp(tmp_path):
    """The jitted EMA operator equals the hand-computed lerp on arbitrary
    trees (donation-safe, exact in f32)."""
    model = models.SimplePointUNet(dim=16, time_dim=16)
    task = tasks.PointDiffusionTask(model, num_points=16, lr=1e-2)
    cfg = TrainerConfig(
        max_epochs=1, ckpt_dir=str(tmp_path / "ck"), tb_dir=None,
        save_top_k=0, ema_decay=0.8,
    )
    trainer = Trainer(task, cfg)

    rng = np.random.default_rng(0)
    tree_a = {"x": rng.standard_normal((4, 3)).astype(np.float32),
              "y": {"z": rng.standard_normal((5,)).astype(np.float32)}}
    tree_b = {"x": rng.standard_normal((4, 3)).astype(np.float32),
              "y": {"z": rng.standard_normal((5,)).astype(np.float32)}}
    got = jax.device_get(
        trainer._ema_update(
            jax.tree_util.tree_map(jnp.asarray, tree_a),
            jax.tree_util.tree_map(jnp.asarray, tree_b),
        )
    )
    want = jax.tree_util.tree_map(
        lambda e, q: 0.8 * e + 0.2 * q, tree_a, tree_b
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(want), jax.tree_util.tree_leaves(got)
    ):
        np.testing.assert_allclose(a, b, rtol=1e-6)
