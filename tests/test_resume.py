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


def test_atomic_save_interrupted_swap_recovers(tmp_path):
    """atomic_save's crash windows never lose a checkpoint.

    The swap is rename-only: old payload renamed aside to .old, new renamed
    in from .tmp. A crash between the renames leaves `path` absent with the
    COMPLETE new payload at .tmp — find_latest_checkpoint must finish the
    swap (preferring the new payload) instead of silently falling back to an
    older top-k file or None."""
    import shutil

    from shapegen_tpu.train.checkpoints import (
        atomic_save, load_checkpoint, recover_interrupted_save,
    )

    d = tmp_path / "ck"
    d.mkdir()
    path = str(d / "last.ckpt")
    old_state = {"w": np.full((2,), 1.0, np.float32)}
    new_state = {"w": np.full((2,), 2.0, np.float32)}

    # Window (b): crash after the old payload moved aside, before the new
    # one renamed in. Rebuild that exact on-disk state from real saves.
    atomic_save(path, new_state, {"epoch": 1})
    os.rename(path, path + ".tmp")
    os.rename(path + ".json", path + ".tmp.json")
    # (the "old" payload that was renamed aside)
    atomic_save(path + ".old.build", old_state, {"epoch": 0})
    os.rename(path + ".old.build", path + ".old")
    os.remove(path + ".old.build.json")

    found = find_latest_checkpoint(str(d))
    assert found == path
    state, meta = load_checkpoint(path)
    assert float(state["w"][0]) == 2.0  # the NEW payload won
    assert meta["epoch"] == 1
    assert not os.path.exists(path + ".tmp")
    assert not os.path.exists(path + ".old")

    # Window (a'): crash BEFORE the new sidecar was written — .tmp payload
    # exists but has no sidecar, old was already renamed aside. Recovery
    # must fall back to the old payload rather than adopt a sidecar-less new.
    os.rename(path, path + ".tmp")
    shutil.move(path + ".json", str(d / "stash.json"))
    atomic_save(path + ".old.build", old_state, {"epoch": 0})
    os.rename(path + ".old.build", path + ".old")
    os.remove(path + ".old.build.json")

    recover_interrupted_save(path)
    assert os.path.isdir(path)
    state2, _ = load_checkpoint(path)
    assert float(state2["w"][0]) == 1.0  # fell back to the OLD payload

    # No-op when the path already exists.
    recover_interrupted_save(path)
    assert os.path.isdir(path)


def test_recover_adopts_orphaned_sidecar(tmp_path):
    """Crash window between ``os.rename(tmp, path)`` and the sidecar
    ``os.replace``: the NEW payload sits at ``path`` with no sidecar while
    its complete sidecar is still at ``tmp + ".json"`` (tmp dir gone, old
    payload still renamed aside). Recovery must adopt the orphan sidecar
    instead of silently losing the epoch/scheduler metadata."""
    from shapegen_tpu.train.checkpoints import atomic_save, load_checkpoint

    d = tmp_path / "ck"
    d.mkdir()
    path = str(d / "last.ckpt")
    atomic_save(path, {"w": np.full((2,), 2.0, np.float32)}, {"epoch": 7})
    # The sidecar never made it past tmp + ".json" in this window.
    os.rename(path + ".json", path + ".tmp.json")
    # The old payload is still renamed aside (rmtree comes after the swap).
    atomic_save(path + ".old.build", {"w": np.zeros(2, np.float32)}, {"epoch": 0})
    os.rename(path + ".old.build", path + ".old")
    os.remove(path + ".old.build.json")

    assert find_latest_checkpoint(str(d)) == path
    state, meta = load_checkpoint(path)
    assert float(state["w"][0]) == 2.0
    assert meta["epoch"] == 7  # metadata recovered, not lost
    assert not os.path.exists(path + ".tmp.json")
    assert not os.path.exists(path + ".old")


def test_recover_tolerates_concurrent_repair(tmp_path, monkeypatch):
    """On a pod with a shared --auto-resume-dir every process calls
    recover_interrupted_save concurrently; the loser of the payload-rename
    race must finish resuming from the winner's repair, not crash with
    FileNotFoundError. Simulated deterministically: the patched os.rename
    performs the winner's rename, then raises the loser's error."""
    import shapegen_tpu.train.checkpoints as ck

    d = tmp_path / "ck"
    d.mkdir()
    path = str(d / "last.ckpt")
    ck.atomic_save(path, {"w": np.full((2,), 2.0, np.float32)}, {"epoch": 3})
    os.rename(path, path + ".tmp")
    os.rename(path + ".json", path + ".tmp.json")

    real_rename = os.rename

    def racing_rename(src, dst):
        real_rename(src, dst)  # the winner's repair lands first
        raise FileNotFoundError(src)  # ...so the loser's own rename fails

    monkeypatch.setattr(ck.os, "rename", racing_rename)
    ck.recover_interrupted_save(path)  # must not raise
    monkeypatch.undo()

    state, meta = ck.load_checkpoint(path)
    assert float(state["w"][0]) == 2.0
    assert meta["epoch"] == 3


def test_topk_ledger_survives_restart(tmp_path):
    """A fresh TopKCheckpointer rehydrates its ledger from the directory, so
    a resumed run keeps Lightning's persisted-ModelCheckpoint-state semantics
    (train_point_ldm.py:84,144): no spurious saves, correct eviction."""
    from shapegen_tpu.train.checkpoints import TopKCheckpointer

    d = str(tmp_path / "ck")
    state = {"w": np.ones((2,), np.float32)}

    ck1 = TopKCheckpointer(d, "val_loss", "m", save_top_k=2)
    assert ck1.maybe_save(state, 0, 0.50) is not None
    assert ck1.maybe_save(state, 1, 0.30) is not None
    assert ck1.maybe_save(state, 2, 0.40) is not None  # evicts 0.50

    # "Crash": new process = new checkpointer over the same directory.
    ck2 = TopKCheckpointer(d, "val_loss", "m", save_top_k=2)
    assert sorted(v for v, _ in ck2._kept) == [0.30, 0.40]
    assert ck2.best_path == ck1.best_path

    # Pre-crash admission state is honored: a worse value is refused...
    assert not ck2.would_save(0.45)
    assert ck2.maybe_save(state, 3, 0.45) is None
    # ...a better one is admitted and evicts the pre-crash 0.40.
    assert ck2.would_save(0.35)
    path = ck2.maybe_save(state, 4, 0.35)
    assert path is not None
    kept_files = sorted(f for f in os.listdir(d) if f.endswith(".ckpt"))
    assert len(kept_files) == 2
    assert not any("=0.40" in f for f in kept_files)

    # Monitors don't cross-contaminate: a train_loss checkpointer over the
    # same directory starts empty.
    ck3 = TopKCheckpointer(d, "train_loss", "m", save_top_k=2)
    assert ck3._kept == []


def test_topk_restart_via_trainer(data_dir, tmp_path):
    """Trainer restart (the crash-recovery path) doesn't re-save worse epochs:
    the second run's checkpointers admit against the first run's files."""
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
            ckpt_prefix="pcd", tb_dir=None, save_top_k=2,
        )
        return Trainer(task, cfg)

    trainer = make_trainer(2)
    trainer.fit(dm)
    pre = {(v, os.path.basename(p)) for v, p in trainer.val_ckpt._kept}
    assert len(pre) > 0

    trainer2 = make_trainer(4)
    post_init = {(v, os.path.basename(p)) for v, p in trainer2.val_ckpt._kept}
    assert post_init == pre  # ledger restored, not empty
    trainer2.fit(dm, resume_from=find_latest_checkpoint(str(tmp_path / "ck")))
    # Never more than save_top_k files per monitor survive a restart.
    val_files = [
        f for f in os.listdir(str(tmp_path / "ck"))
        if f.endswith(".ckpt") and "val_loss" in f
    ]
    assert len(val_files) <= 2


def test_topk_no_duplicate_ledger_entries_on_resave(tmp_path):
    """A resumed run that re-earns an identical (epoch, value) name rewrites
    the same path; the ledger must hold ONE tuple for it, so a later eviction
    can never delete a directory another tuple (possibly best_path) still
    references."""
    from shapegen_tpu.train.checkpoints import TopKCheckpointer

    d = str(tmp_path / "ck")
    state = {"w": np.ones((2,), np.float32)}

    ck1 = TopKCheckpointer(d, "val_loss", "m", save_top_k=3)
    best = ck1.maybe_save(state, 0, 0.30)
    assert best is not None

    # "Crash" + resume: the rehydrated checkpointer re-earns the exact same
    # (epoch, value) -> same filename -> same path.
    ck2 = TopKCheckpointer(d, "val_loss", "m", save_top_k=3)
    resaved = ck2.maybe_save(state, 0, 0.30)
    assert resaved == best
    assert len(ck2._kept) == 1  # deduped, not double-entered

    # Fill to capacity, then force evictions past where a duplicate tuple
    # would have been popped; best_path must stay on disk throughout.
    ck2.maybe_save(state, 1, 0.50)
    ck2.maybe_save(state, 2, 0.40)
    ck2.maybe_save(state, 3, 0.35)  # evicts 0.50
    ck2.maybe_save(state, 4, 0.32)  # evicts 0.40
    assert ck2.best_path == best
    assert os.path.isdir(best)
    assert len(ck2._kept) == 3


def test_save_top_k_minus_one_keeps_all(tmp_path):
    """Lightning save_top_k=-1 semantics: every checkpoint is kept."""
    from shapegen_tpu.train.checkpoints import TopKCheckpointer

    ck = TopKCheckpointer(str(tmp_path), "val_loss", "m", save_top_k=-1)
    state = {"w": np.zeros((2,), np.float32)}
    for epoch, v in enumerate([3.0, 1.0, 2.0, 0.5]):
        assert ck.would_save(v)
        assert ck.maybe_save(state, epoch, v) is not None
    assert len(ck._kept) == 4
    # Rehydration sees all of them too.
    ck2 = TopKCheckpointer(str(tmp_path), "val_loss", "m", save_top_k=-1)
    assert len(ck2._kept) == 4


def test_save_top_k_zero_disables(tmp_path):
    from shapegen_tpu.train.checkpoints import TopKCheckpointer

    ck = TopKCheckpointer(str(tmp_path), "val_loss", "m", save_top_k=0)
    assert not ck.would_save(0.1)
    assert ck.maybe_save({"w": np.zeros(2, np.float32)}, 0, 0.1) is None
