"""Data pipeline tests on a synthetic .dd directory."""

import os
import subprocess
import sys

import numpy as np
import pytest

from shapegen_tpu.data import (
    PointCloudDataDirectoryModule,
    PointCloudDataset,
    load_dd,
    save_dd,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("ddata")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "make_synthetic_data.py"),
         str(d), "--per-category", "6"],
        check=True,
        cwd=REPO,
    )
    return str(d)


def test_dd_roundtrip(tmp_path):
    arr = np.random.default_rng(0).random((4, 4, 4)).astype(np.float32)
    p = str(tmp_path / "x.dd")
    save_dd(p, arr)
    np.testing.assert_array_equal(load_dd(p), arr)


def _write_authentic_deepdish_file(path, arr):
    """Hand-build a byte-layout replica of what deepdish 0.3.5 + pytables
    write for ``dd.io.save(path, {'data': arr})`` — the reference's dataset
    format (preprocessing.py:103-107, data.py:170-173). Built with h5py only
    (neither pytables nor deepdish ships in this image), replicating:
    pytables root-group attrs, deepdish's DEEPDISH_IO_VERSION stamp, and a
    '/data' CArray node (chunked, zlib-9 + shuffle, CLASS/VERSION/TITLE
    attrs). Deliberately independent of save_dd so load_dd is tested against
    the LAYOUT, not against our own writer."""
    import h5py

    with h5py.File(path, "w") as f:
        f.attrs.create("CLASS", np.bytes_("GROUP"))
        f.attrs.create("PYTABLES_FORMAT_VERSION", np.bytes_("2.1"))
        f.attrs.create("TITLE", np.bytes_(""))
        f.attrs.create("VERSION", np.bytes_("1.0"))
        f.attrs.create("DEEPDISH_IO_VERSION", np.int64(12))
        ds = f.create_dataset(
            "data", data=arr, chunks=arr.shape,
            compression="gzip", compression_opts=9, shuffle=True,
        )
        ds.attrs.create("CLASS", np.bytes_("CARRAY"))
        ds.attrs.create("TITLE", np.bytes_(""))
        ds.attrs.create("VERSION", np.bytes_("1.1"))


def test_load_dd_reads_authentic_deepdish_layout(tmp_path):
    """load_dd must consume the reference toolchain's real on-disk layout
    (group attrs incl. DEEPDISH_IO_VERSION, pytables CArray filters), not
    just our own save_dd output."""
    arr = np.random.default_rng(3).random((32, 32, 32)).astype(np.float32)
    p = str(tmp_path / "authentic.dd")
    _write_authentic_deepdish_file(p, arr)
    np.testing.assert_array_equal(load_dd(p), arr)


def test_load_dd_fallback_on_renamed_node(tmp_path):
    """A pytables file whose only array node is not named 'data' still loads
    via the first-dataset fallback (deepdish keys the dict on the node name;
    a hand-rolled file may differ)."""
    import h5py

    arr = np.arange(8, dtype=np.float32).reshape(2, 4)
    p = str(tmp_path / "odd.dd")
    _write_authentic_deepdish_file(p, arr)
    with h5py.File(p, "a") as f:
        f.move("data", "voxels")
    np.testing.assert_array_equal(load_dd(p), arr)


def test_save_dd_emits_deepdish_compatible_layout(tmp_path):
    """save_dd output must be readable by the reference's ``dd.io.load``:
    deepdish maps any chunked dataset to tables.CArray (a tables.Array
    subclass its _load_level returns as node[:]) and keys the result dict on
    the node name — so the executable contract here is the exact pytables
    structure: root attrs (incl. DEEPDISH_IO_VERSION), a chunked
    gzip+shuffle '/data' node, and CArray class attrs."""
    import h5py

    arr = np.random.default_rng(4).random((16, 16, 16)).astype(np.float32)
    p = str(tmp_path / "ours.dd")
    save_dd(p, arr)
    with h5py.File(p, "r") as f:
        assert f.attrs["CLASS"] == b"GROUP"
        assert f.attrs["PYTABLES_FORMAT_VERSION"] == b"2.1"
        assert int(f.attrs["DEEPDISH_IO_VERSION"]) == 12
        ds = f["data"]
        assert ds.attrs["CLASS"] == b"CARRAY"
        assert ds.attrs["VERSION"] == b"1.1"
        assert ds.chunks is not None  # chunked => tables.CArray on load
        assert ds.compression == "gzip" and ds.shuffle
        np.testing.assert_array_equal(ds[...], arr)


def test_dataset_consumes_authentic_deepdish_directory(tmp_path):
    """End-to-end: a directory of authentic-layout files drives the full
    PointCloudDataset path (category filter, voxel normalize, voxel->pc)."""
    rng = np.random.default_rng(5)
    for i in range(3):
        grid = (rng.random((32, 32, 32)) > 0.9).astype(np.float32)
        _write_authentic_deepdish_file(
            str(tmp_path / f"shape_net_voxel_data_03001627_chair_{i:04d}.dd"),
            grid,
        )
    ds = PointCloudDataset(
        str(tmp_path), num_points=64, input_mode="voxels",
        output_mode="point_clouds", relevant_object_categories=["chair"],
        seed=24,
    )
    assert len(ds) == 3
    pc = ds[0]
    assert pc.shape == (64, 3)
    assert np.isfinite(pc).all()


def test_category_filter(data_dir):
    all_ds = PointCloudDataset(data_dir, relevant_object_categories=["all"])
    chair_ds = PointCloudDataset(data_dir, relevant_object_categories=["chair"])
    two_ds = PointCloudDataset(
        data_dir, relevant_object_categories=["chair", "table"]
    )
    assert len(all_ds) == 18
    assert len(chair_ds) == 6
    assert len(two_ds) == 12
    assert all("03001627" in f for f in chair_ds.file_list)


def test_voxels_fast_path_shape(data_dir):
    ds = PointCloudDataset(
        data_dir, output_mode="voxels", jitter=False, rotate=False
    )
    v = ds[0]
    assert v.shape == (32, 32, 32, 1)
    assert set(np.unique(v)).issubset({0.0, 1.0})


def test_point_cloud_output(data_dir):
    ds = PointCloudDataset(
        data_dir,
        num_points=512,
        output_mode="point_clouds",
        jitter=False,
        rotate=False,
    )
    pc = ds[0]
    assert pc.shape == (512, 3)
    # Unit-sphere normalized (data.py:230-238).
    norms = np.linalg.norm(pc - pc.mean(0), axis=1)
    assert norms.max() <= 1.2  # sampling after normalize can't exceed much


def test_point_cloud_with_augmentations(data_dir):
    ds = PointCloudDataset(
        data_dir,
        num_points=256,
        output_mode="point_clouds",
        jitter=True,
        rotate=True,
    )
    a = ds[0]
    b = ds[0]
    assert a.shape == (256, 3)
    assert not np.allclose(a, b)  # random augs differ per call


def test_datamodule_split_and_loaders(data_dir):
    dm = PointCloudDataDirectoryModule(
        data_dir,
        num_points=128,
        batch_size=4,
        num_workers=2,
        output_mode="point_clouds",
        augmentations=False,
        relevant_object_categories=["all"],
    )
    dm.setup()
    assert len(dm.train_indices) == 14 and len(dm.val_indices) == 4
    assert not set(dm.train_indices) & set(dm.val_indices)

    train_batches = list(dm.train_dataloader())
    assert sum(len(b) for b in train_batches) == 14
    assert train_batches[0].shape == (4, 128, 3)

    val_batches = list(dm.val_dataloader())
    assert sum(len(b) for b in val_batches) == 4

    # Split deterministic across instantiations (seed 24).
    dm2 = PointCloudDataDirectoryModule(
        data_dir, num_points=128, batch_size=4, output_mode="point_clouds",
        augmentations=False,
    )
    dm2.setup()
    np.testing.assert_array_equal(dm.train_indices, dm2.train_indices)


def test_mixed_resolution_thread_safety(tmp_path):
    """Per-sample resolution is derived from the file itself, not from shared
    dataset state — concurrent prefetch workers over mixed-resolution files
    must each re-voxelize at their own file's resolution."""
    rng = np.random.default_rng(0)
    resolutions = {}
    for i, res in enumerate([16, 32] * 4):
        name = f"m_0_0_0_02691156_{i}.dd"  # airplane synset in token 5
        grid = (rng.random((res, res, res)) > 0.8).astype(np.float32)
        grid[res // 2, res // 2, res // 2] = 1.0  # never-empty guard
        save_dd(str(tmp_path / name), grid)
        resolutions[name] = res

    # jitter=True forces the augment -> re-voxelize path (the racy one).
    ds = PointCloudDataset(
        str(tmp_path), output_mode="voxels", jitter=True, rotate=False,
        relevant_object_categories=["all"],
    )
    expected = [resolutions[f] for f in ds.file_list]

    # Sequential interleaving: a 32-file right after a 16-file (and vice
    # versa) must not inherit the previous file's resolution.
    for idx in [0, 1, 0, 1]:
        res = expected[idx]
        assert ds[idx].shape == (res, res, res, 1)

    # Concurrent: hammer __getitem__ from many threads (what the prefetch
    # pool does within a batch); every sample keeps its own file's resolution.
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(8) as pool:
        for _ in range(5):
            results = list(pool.map(ds.__getitem__, range(len(ds))))
            for r, res in zip(results, expected):
                assert r.shape == (res, res, res, 1)


def test_datamodule_voxel_mode(data_dir):
    dm = PointCloudDataDirectoryModule(
        data_dir,
        batch_size=4,
        output_mode="voxels",
        augmentations=False,
        relevant_object_categories=["airplane"],
    )
    dm.setup()
    batch = next(iter(dm.train_dataloader()))
    assert batch.shape == (4, 32, 32, 32, 1)


def test_datamodule_multihost_index_sharding(data_dir, monkeypatch):
    """On a pod, every process computes the same seeded 80/20 split, then
    takes a disjoint equal-length round-robin shard of it (SPMD lockstep)."""
    import jax

    def build(pc, pi):
        monkeypatch.setattr(jax, "process_count", lambda: pc)
        monkeypatch.setattr(jax, "process_index", lambda: pi)
        m = PointCloudDataDirectoryModule(
            data_dir, num_points=64, batch_size=2,
            output_mode="point_clouds", augmentations=False,
        )
        m.setup()
        return m

    full = build(1, 0)
    h0 = build(2, 0)
    h1 = build(2, 1)

    tr0, tr1 = set(h0.train_indices.tolist()), set(h1.train_indices.tolist())
    va0, va1 = set(h0.val_indices.tolist()), set(h1.val_indices.tolist())
    assert tr0.isdisjoint(tr1) and va0.isdisjoint(va1)
    # Equalized: both hosts run the same number of samples/batches.
    assert len(h0.train_indices) == len(h1.train_indices)
    assert len(h0.val_indices) == len(h1.val_indices)
    # Shards come from the same global split every host computes.
    assert (tr0 | tr1) <= set(full.train_indices.tolist())
    assert (va0 | va1) <= set(full.val_indices.tolist())


def test_datamodule_multihost_rejects_tiny_val_split(data_dir, monkeypatch):
    """Equalized sharding truncates to len//process_count: a val split
    smaller than the pod would leave some host with zero val samples
    (undefined val_loss -> broken plateau scheduler / top-k monitor).
    setup() must fail loudly instead."""
    import jax
    import pytest

    monkeypatch.setattr(jax, "process_count", lambda: 10_000)
    monkeypatch.setattr(jax, "process_index", lambda: 0)
    m = PointCloudDataDirectoryModule(
        data_dir, num_points=64, batch_size=2,
        output_mode="point_clouds", augmentations=False,
    )
    with pytest.raises(ValueError, match="val split"):
        m.setup()


def test_datamodule_multihost_rejects_tiny_train_split(data_dir, monkeypatch):
    """Same failure class for the train side: a train split smaller than the
    pod equalizes to zero train batches per host — an epoch with no steps
    and undefined train_loss. A low train_val_split makes train the small
    side so the train guard (not the val one) must fire."""
    import jax
    import pytest

    monkeypatch.setattr(jax, "process_count", lambda: 10)
    monkeypatch.setattr(jax, "process_index", lambda: 0)
    m = PointCloudDataDirectoryModule(
        data_dir, num_points=64, batch_size=2, train_val_split=0.05,
        output_mode="point_clouds", augmentations=False,
    )
    with pytest.raises(ValueError, match="train split"):
        m.setup()
