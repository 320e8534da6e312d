"""Checkpoint/resume semantics: last.ckpt, find-latest, epoch continuation."""

import os
import subprocess
import sys

import jax
import numpy as np
import pytest

from shapegen_tpu import models
from shapegen_tpu.data import PointCloudDataDirectoryModule
from shapegen_tpu.train import Trainer, TrainerConfig, tasks
from shapegen_tpu.train.checkpoints import find_latest_checkpoint

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("resumedata")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "make_synthetic_data.py"),
         str(d), "--per-category", "4"],
        check=True, cwd=REPO,
    )
    return str(d)


def test_last_ckpt_and_resume_continues_epochs(data_dir, tmp_path, caplog):
    dm = PointCloudDataDirectoryModule(
        data_dir, num_points=32, batch_size=4, num_workers=1,
        output_mode="point_clouds", augmentations=False,
        relevant_object_categories=["all"],
    )
    model = models.SimplePointUNet(dim=32, time_dim=32)

    def make_trainer(max_epochs):
        task = tasks.PointDiffusionTask(model, num_points=32, lr=1e-3)
        cfg = TrainerConfig(
            max_epochs=max_epochs, ckpt_dir=str(tmp_path / "ck"),
            ckpt_prefix="pcd", tb_dir=None, save_top_k=1,
        )
        return task, Trainer(task, cfg)

    task, trainer = make_trainer(2)
    state1 = trainer.fit(dm)

    last = find_latest_checkpoint(str(tmp_path / "ck"))
    assert last is not None and last.endswith("last.ckpt")

    # Resume for 2 more epochs: start_epoch must be 2 (epoch metadata + 1).
    task2, trainer2 = make_trainer(4)
    state2 = trainer2.fit(dm, resume_from=last)
    # Resumed state continued training (step counter advanced past phase 1).
    assert int(state2.step) > int(state1.step)

    # Params actually restored: a fresh init differs, the resumed one doesn't
    # revert to init.
    fresh = task2.init_state(jax.random.PRNGKey(0), np.zeros((2, 32, 3), "f4"))
    p_fresh = jax.tree_util.tree_leaves(fresh.params)[0]
    p_resumed = jax.tree_util.tree_leaves(state2.params)[0]
    assert not np.allclose(np.asarray(p_fresh), np.asarray(p_resumed))


def test_find_latest_prefers_last(tmp_path):
    assert find_latest_checkpoint(str(tmp_path / "missing")) is None
