"""In-training TensorBoard figure side-channel of scripts/train_point_ldm.py.

The reference logs validation figures every ``num_val_batches // 5``
validation batches and epoch-end generated-sample figures for every VAE
(networks.py:1343-1361, 2418-2443, 2470-2490) and for LatentDiffusion
(diffusion.py:446-487, 715-734). These tests pin the wiring: tag strings,
cadence, and integration through a real Trainer.fit.
"""

import importlib.util
import os
import sys
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_script():
    spec = importlib.util.spec_from_file_location(
        "ldm_script", os.path.join(REPO, "scripts", "train_point_ldm.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ldm_script():
    return _load_script()


def _viz_args(**over):
    base = dict(seed=24, viz_samples=2, viz_steps=4, max_decode_points=256)
    base.update(over)
    return SimpleNamespace(**base)


class _CaptureTrainer:
    def __init__(self):
        self.tags = []

    def add_figure(self, tag, fig, epoch):
        self.tags.append((tag, epoch))


def _voxel_batch(b=4):
    key = jax.random.PRNGKey(0)
    return (jax.random.uniform(key, (b, 32, 32, 32, 1)) > 0.7).astype(
        jnp.float32
    )


def test_vae3d_large_hooks_tags_and_cadence(ldm_script):
    from shapegen_tpu import models
    from shapegen_tpu.train import tasks

    args = _viz_args()
    task = tasks.VAE3DLargeTask(models.VAE3DLarge(latent_dim=16), max_epochs=2)
    batch = _voxel_batch()
    state = task.init_state(jax.random.PRNGKey(1), batch)
    epoch_end, val_batch = ldm_script.make_vae_hooks(args, task, "vae3d_large")
    assert len(epoch_end) == 1 and len(val_batch) == 1

    cap = _CaptureTrainer()
    # 11 val batches -> interval 2: batches 0,2,4,... fire; odd ones don't.
    for idx in range(5):
        val_batch[0](cap, state, epoch=0, batch_idx=idx,
                     num_val_batches=11, batch=batch)
    fired = [t for t, _ in cap.tags]
    # img_idx = batch_idx // interval, sample_idx = B // 2 = 2.
    assert fired == [
        "input_vs_reconstructed_point_cloud_3d_0_2", "input_point_cloud_2d_0_2",
        "input_vs_reconstructed_point_cloud_3d_1_2", "input_point_cloud_2d_1_2",
        "input_vs_reconstructed_point_cloud_3d_2_2", "input_point_cloud_2d_2_2",
    ]

    cap = _CaptureTrainer()
    epoch_end[0](cap, state, epoch=3)
    tags = [t for t, e in cap.tags]
    epochs = {e for _, e in cap.tags}
    assert epochs == {3}
    # 2 samples, 3d+2d each — unless a decoded cloud is empty (reference
    # skips those, networks.py:2480-2482).
    assert set(tags) <= {
        "vae_generated_sample_3d_0", "vae_generated_sample_2d_0",
        "vae_generated_sample_3d_1", "vae_generated_sample_2d_1",
    }
    assert len(tags) % 2 == 0


def test_point_vae_hooks_input_only_tags(ldm_script):
    from shapegen_tpu import models
    from shapegen_tpu.train import tasks

    args = _viz_args()
    task = tasks.SimplePointNetVAETask(
        models.SimplePointNetVAE(num_points=64, latent_dim=16), max_epochs=2
    )
    batch = jax.random.normal(jax.random.PRNGKey(0), (4, 64, 3))
    state = task.init_state(jax.random.PRNGKey(1), batch)
    epoch_end, val_batch = ldm_script.make_vae_hooks(args, task, "simple_pointnet")

    cap = _CaptureTrainer()
    val_batch[0](cap, state, 0, 0, 10, batch)
    val_batch[0](cap, state, 0, 1, 10, batch)  # interval 2: no fire
    val_batch[0](cap, state, 0, 2, 10, batch)
    assert [t for t, _ in cap.tags] == [
        "input_point_cloud_3d_0_0", "input_point_cloud_2d_0_0",
        "input_point_cloud_3d_1_0", "input_point_cloud_2d_1_0",
    ]

    cap = _CaptureTrainer()
    epoch_end[0](cap, state, epoch=1)
    assert [t for t, _ in cap.tags] == [
        "vae_generated_sample_3d_0", "vae_generated_sample_2d_0",
        "vae_generated_sample_3d_1", "vae_generated_sample_2d_1",
    ]


def test_viz_samples_zero_disables_hooks(ldm_script):
    epoch_end, val_batch = ldm_script.make_vae_hooks(
        _viz_args(viz_samples=0), None, "vae3d_large"
    )
    assert epoch_end == [] and val_batch == []
    epoch_end, val_batch = ldm_script.make_ldm_hooks(
        _viz_args(viz_samples=0), None
    )
    assert epoch_end == [] and val_batch == []


def test_ldm_hooks_roundtrip_tags(ldm_script):
    from shapegen_tpu import models
    from shapegen_tpu.train import tasks

    args = _viz_args()
    vae = models.VAE3DLarge(latent_dim=16)
    rng = jax.random.PRNGKey(0)
    vae_vars = vae.init(rng, jnp.zeros((1, 32, 32, 32, 1)), rng, train=False)
    task = tasks.LatentDiffusionTask(
        models.SimpleLatentUNet(latent_dim=16, dim=32, time_dim=32),
        vae, vae_vars, latent_dim=16, max_epochs=2,
    )
    batch = _voxel_batch()
    state = task.init_state(jax.random.PRNGKey(1), batch)
    epoch_end, val_batch = ldm_script.make_ldm_hooks(args, task)

    cap = _CaptureTrainer()
    val_batch[0](cap, state, 2, 0, 10, batch)
    val_batch[0](cap, state, 2, 3, 10, batch)  # interval 2: no fire
    assert [t for t, _ in cap.tags] == [
        "input_vs_reconstructed_point_cloud_3d_0_2", "input_point_cloud_2d_0_2",
    ]
    assert all(e == 2 for _, e in cap.tags)

    cap = _CaptureTrainer()
    epoch_end[0](cap, state, epoch=0)
    tags = [t for t, _ in cap.tags]
    assert set(tags) <= {
        "latent_diffusion_generated_sample_3d_0",
        "latent_diffusion_generated_sample_2d_0",
        "latent_diffusion_generated_sample_3d_1",
        "latent_diffusion_generated_sample_2d_1",
    }
    assert len(tags) % 2 == 0


def test_hooks_fire_through_real_fit(ldm_script, tmp_path):
    """Integration: the hooks wired exactly as train_point_ldm.py wires them
    fire at the reference cadence inside a real 1-epoch Trainer.fit."""
    import subprocess

    from shapegen_tpu import models
    from shapegen_tpu.data import PointCloudDataDirectoryModule
    from shapegen_tpu.train import Trainer, TrainerConfig, tasks

    data_dir = tmp_path / "data"
    subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "make_synthetic_data.py"),
         str(data_dir), "--per-category", "8"],
        check=True, cwd=REPO,
    )
    dm = PointCloudDataDirectoryModule(
        str(data_dir), batch_size=2, num_workers=1, output_mode="voxels",
        augmentations=False, relevant_object_categories=["chair"],
    )
    args = _viz_args(viz_samples=1)
    task = tasks.VAE3DLargeTask(models.VAE3DLarge(latent_dim=16), max_epochs=1)
    epoch_end, val_batch = ldm_script.make_vae_hooks(args, task, "vae3d_large")
    cfg = TrainerConfig(
        max_epochs=1, ckpt_dir=str(tmp_path / "ck"), ckpt_prefix="vae",
        tb_dir=None, save_top_k=0, save_last_every=10**6,
    )
    trainer = Trainer(
        task, cfg, epoch_end_hooks=epoch_end, val_batch_hooks=val_batch
    )
    tags = []
    trainer.add_figure = lambda tag, fig, epoch: tags.append(tag)
    trainer.fit(dm)

    dm.setup()
    n_val = len(dm.val_dataloader())
    interval = max(n_val // 5, 1)
    expected_firings = len(range(0, n_val, interval))
    comparisons = [t for t in tags if t.startswith("input_vs_reconstructed")]
    assert len(comparisons) == expected_firings
    assert any(t.startswith("vae_generated_sample_3d") for t in tags) or (
        # an untrained VAE may decode to an empty cloud at threshold 0.4
        all(not t.startswith("vae_generated") for t in tags)
    )
