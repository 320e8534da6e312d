"""Category-conditional generation extension tests."""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shapegen_tpu import models
from shapegen_tpu.data import PointCloudDataDirectoryModule, PointCloudDataset
from shapegen_tpu.train import Trainer, TrainerConfig, tasks

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("conddata")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "make_synthetic_data.py"),
         str(d), "--per-category", "4"],
        check=True, cwd=REPO,
    )
    return str(d)


def test_dataset_labels(data_dir):
    ds = PointCloudDataset(
        data_dir, num_points=32, output_mode="point_clouds",
        jitter=False, rotate=False, return_labels=True,
    )
    pc, label = ds[0]
    assert pc.shape == (32, 3)
    # Synthetic synsets: airplane 02691156 (index 0 in sorted 55-class map),
    # chair 03001627, table 04379243.
    labels = {ds.label_for(i) for i in range(len(ds))}
    assert len(labels) == 3
    assert all(0 <= l < 55 for l in labels)
    # airplane is the smallest synset id -> label 0
    air_idx = next(
        i for i, f in enumerate(ds.file_list) if "02691156" in f
    )
    assert ds.label_for(air_idx) == 0


def test_conditional_model_shapes():
    model = models.PointUNetLarge(dim=32, time_dim=32, num_classes=55)
    x = jnp.zeros((2, 16, 3))
    t = jnp.array([0.1, 0.9])
    y = jnp.array([3, 41])
    variables = model.init(jax.random.PRNGKey(0), x, t, y=y, train=False)
    out = model.apply(variables, x, t, y=y, train=False)
    assert out.shape == (2, 16, 3)
    # Null-token path (y=None) also works.
    out_null = model.apply(variables, x, t, train=False)
    assert out_null.shape == (2, 16, 3)
    # Different labels change the prediction.
    out_other = model.apply(variables, x, t, y=jnp.array([5, 7]), train=False)
    assert not np.allclose(np.asarray(out), np.asarray(out_other))


def test_conditional_train_and_sample(data_dir, tmp_path):
    dm = PointCloudDataDirectoryModule(
        data_dir, num_points=32, batch_size=4, num_workers=1,
        output_mode="point_clouds", augmentations=False,
        relevant_object_categories=["all"], return_labels=True,
    )
    model = models.PointUNetLarge(dim=32, time_dim=32, num_classes=55)
    task = tasks.PointDiffusionTask(
        model, num_points=32, lr=1e-3, num_classes=55
    )
    cfg = TrainerConfig(
        max_epochs=1, ckpt_dir=str(tmp_path / "c"), ckpt_prefix="cond",
        tb_dir=None, save_top_k=1,
    )
    trainer = Trainer(task, cfg)
    state = trainer.fit(dm)

    out = task.sample_conditional(
        state, jax.random.PRNGKey(0), labels=jnp.array([0, 18]),
        num_points=32, num_steps=4, guidance_scale=1.5,
    )
    assert out.shape == (2, 32, 3)
    assert np.isfinite(np.asarray(out)).all()
    # Unconditional sampling still works on a conditional model (null token).
    un = task.sample(state, jax.random.PRNGKey(1), 2, num_points=32, num_steps=4)
    assert un.shape == (2, 32, 3)


def test_eval_conditional_script_smoke(data_dir, tmp_path):
    """scripts/eval_conditional.py end-to-end on a tiny conditional ckpt:
    both statistics (CD + Sinkhorn EMD), data-ceiling matrices, label probe,
    and the JSON evidence schema the BASELINE.md tables are built from."""
    dm = PointCloudDataDirectoryModule(
        data_dir, num_points=32, batch_size=4, num_workers=1,
        output_mode="point_clouds", augmentations=False,
        relevant_object_categories=["all"], return_labels=True,
    )
    model = models.PointUNetLarge(dim=32, time_dim=32, num_classes=55)
    task = tasks.PointDiffusionTask(
        model, num_points=32, lr=1e-3, num_classes=55
    )
    ckpt_dir = str(tmp_path / "ck")
    cfg = TrainerConfig(
        max_epochs=1, ckpt_dir=ckpt_dir, ckpt_prefix="cond",
        tb_dir=None, save_top_k=1,
    )
    Trainer(task, cfg).fit(dm)
    from shapegen_tpu.train.checkpoints import find_latest_checkpoint

    ckpt = find_latest_checkpoint(ckpt_dir)
    assert ckpt is not None

    out_json = str(tmp_path / "ev.json")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    prior = env.get("PYTHONPATH", "")
    env["PYTHONPATH"] = REPO + (os.pathsep + prior if prior else "")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "eval_conditional.py"),
         "--checkpoint", ckpt, "--data-dir", data_dir,
         "--categories", "airplane", "chair",
         "--num-per-class", "2", "--num-steps", "4",
         "--guidance", "0", "2", "--max-refs", "4",
         "--emd-points", "16", "--out", out_json],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr

    import json

    with open(out_json) as f:
        ev = json.load(f)
    assert ev["categories"] == ["airplane", "chair"]
    assert np.asarray(ev["ref_separability"]).shape == (2, 2)
    assert np.asarray(ev["ref_separability_emd"]).shape == (2, 2)
    assert set(ev["label_probe"]) == {"true", "wrong"}
    assert len(ev["per_guidance"]) == 2
    for rec, g in zip(ev["per_guidance"], (0.0, 2.0)):
        assert rec["guidance"] == g
        for k in ("mean_cd", "mmd_cd", "mean_emd", "mmd_emd"):
            m = np.asarray(rec[k])
            assert m.shape == (2, 2) and np.isfinite(m).all()
        assert len(rec["own_class_separates_mean"]) == 2
        assert len(rec["own_class_separates_mean_emd"]) == 2
        assert set(rec["cov_own"]) == {"airplane", "chair"}
