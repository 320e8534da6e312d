"""Smoke training for the remaining VAE task families."""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shapegen_tpu import models
from shapegen_tpu.data import PointCloudDataDirectoryModule
from shapegen_tpu.train import Trainer, TrainerConfig, tasks

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("vaetasks")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "make_synthetic_data.py"),
         str(d), "--per-category", "4"],
        check=True, cwd=REPO,
    )
    return str(d)


def _fit_one_epoch(task, dm, tmp_path, name):
    cfg = TrainerConfig(
        max_epochs=1, ckpt_dir=str(tmp_path / name), ckpt_prefix=name,
        tb_dir=None, save_top_k=1,
    )
    return Trainer(task, cfg).fit(dm)


def test_vae3d_task_smoke(data_dir, tmp_path):
    dm = PointCloudDataDirectoryModule(
        data_dir, batch_size=4, num_workers=1, output_mode="voxels",
        augmentations=False, relevant_object_categories=["chair"],
    )
    task = tasks.VAE3DTask(models.VAE3D(latent_dim=16))
    state = _fit_one_epoch(task, dm, tmp_path, "vae3d")
    vox = task.sample_voxels(state, jax.random.PRNGKey(0), 2)
    assert vox.shape == (2, 32, 32, 32, 1)
    assert np.isfinite(np.asarray(vox)).all()


def test_simple_pointnet_vae_task_smoke(data_dir, tmp_path):
    dm = PointCloudDataDirectoryModule(
        data_dir, num_points=64, batch_size=4, num_workers=1,
        output_mode="point_clouds", augmentations=False,
        relevant_object_categories=["chair"],
    )
    task = tasks.SimplePointNetVAETask(
        models.SimplePointNetVAE(num_points=64, latent_dim=16), max_epochs=1
    )
    state = _fit_one_epoch(task, dm, tmp_path, "spvae")
    out = task.sample(state, jax.random.PRNGKey(0), 2)
    assert out.shape == (2, 64, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_pointnet_vae_task_smoke(data_dir, tmp_path):
    dm = PointCloudDataDirectoryModule(
        data_dir, num_points=64, batch_size=4, num_workers=1,
        output_mode="point_clouds", augmentations=False,
        relevant_object_categories=["chair"],
    )
    task = tasks.PointNetVAETask(
        models.PointNetVAE(num_points=64, latent_dim=16), max_epochs=1
    )
    state = _fit_one_epoch(task, dm, tmp_path, "pnvae")
    out = task.sample(state, jax.random.PRNGKey(0), 2)
    assert out.shape == (2, 64, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_vae_training_grads_pallas_vs_xla_chamfer(rng, monkeypatch):
    """The TPU chamfer routing change: task training gradients through the
    Pallas custom-VJP kernel (interpret mode) must match the XLA-chamfer
    gradients — the end-to-end integration of ops.pallas_kernels
    .min_dists_vjp into SimplePointNetVAETask._loss."""
    from shapegen_tpu.metrics import metrics as M
    from shapegen_tpu.ops import pallas_kernels as PK

    task = tasks.SimplePointNetVAETask(
        models.SimplePointNetVAE(num_points=64, latent_dim=8), max_epochs=1
    )
    batch = jnp.asarray(rng.standard_normal((2, 64, 3)).astype(np.float32))
    state = task.init_state(jax.random.PRNGKey(0), batch)
    step_rng = jax.random.PRNGKey(1)
    kernel = PK.min_dists_with_args_pallas

    def grads_with(pallas: bool):
        monkeypatch.setattr(M, "_PALLAS_OVERRIDE", pallas)
        if pallas:
            # Force interpret mode (no Mosaic on the CPU harness); the VJP
            # resolves the kernel from module globals at call time.
            monkeypatch.setattr(
                PK, "min_dists_with_args_pallas",
                lambda x, y, interpret=False: kernel(x, y, interpret=True),
            )
        def loss_fn(p):
            loss, _ = task._loss(p, state.batch_stats, batch, step_rng, True)
            return loss
        return jax.grad(loss_fn)(state.params)

    g_xla = grads_with(False)
    g_pal = grads_with(True)
    flat_x = jax.tree_util.tree_leaves(g_xla)
    flat_p = jax.tree_util.tree_leaves(g_pal)
    assert len(flat_x) == len(flat_p)
    for a, b in zip(flat_x, flat_p):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=1e-5
        )
