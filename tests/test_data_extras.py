"""Tests for the legacy in-memory module, FPS sampling option, and factory."""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shapegen_tpu.data import PointCloudDataModule, PointCloudDataset

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("extras")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "make_synthetic_data.py"),
         str(d), "--per-category", "4"],
        check=True, cwd=REPO,
    )
    return str(d)


def test_in_memory_data_module(rng):
    clouds = rng.standard_normal((20, 64, 3)).astype(np.float32)
    dm = PointCloudDataModule(clouds, batch_size=8)
    dm.setup()
    assert len(dm.train_data) == 16 and len(dm.val_data) == 4
    batches = list(dm.train_dataloader())
    assert sum(len(b) for b in batches) == 16
    assert batches[0].shape == (8, 64, 3)


def test_fps_sampling_option(data_dir):
    ds = PointCloudDataset(
        data_dir, num_points=64, output_mode="point_clouds",
        jitter=False, rotate=False, sampling="fps",
    )
    pc = ds[0]
    assert pc.shape == (64, 3)
    # FPS returns distinct points when enough are available.
    assert len({tuple(r) for r in pc.tolist()}) == 64
    with pytest.raises(ValueError):
        PointCloudDataset(data_dir, sampling="nope")


def test_factory_checkpoint_roundtrip(tmp_path):
    """Save -> load_task_checkpoint -> identical forward outputs."""
    from shapegen_tpu import models
    from shapegen_tpu.train import tasks
    from shapegen_tpu.train.checkpoints import TopKCheckpointer
    from shapegen_tpu.train.factory import load_task_checkpoint

    model = models.PointUNetLarge(dim=32, time_dim=32)
    task = tasks.PointDiffusionTask(model, num_points=2048, lr=1e-3)
    # num_points must match the factory's sample batch; dims ride in hparams.
    task.hparams["dim"] = 32
    task.hparams["time_dim"] = 32
    state = task.init_state(jax.random.PRNGKey(3), jnp.zeros((2, 2048, 3)))

    ck = TopKCheckpointer(str(tmp_path), "val_loss", "point_cloud_diffusion", 1)
    path = ck.maybe_save(
        jax.device_get({
            "params": state.params, "batch_stats": state.batch_stats,
            "opt_state": state.opt_state, "step": state.step,
        }),
        epoch=3, value=0.5, hparams=task.hparams,
    )
    task2, state2, meta = load_task_checkpoint(path)
    assert meta["epoch"] == 3
    assert task2.num_points == 2048

    x = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 3))
    t = jnp.array([0.4])
    a = task.denoise_fn(state)(x, t)
    b = task2.denoise_fn(state2)(x, t)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
