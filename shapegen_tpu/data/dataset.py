"""ShapeNet ``.dd`` (HDF5) data pipeline.

Host-side numpy pipeline with a thread-pool prefetcher feeding the device —
the TPU-native replacement for the reference's torch DataLoader with 4 worker
processes (data.py:362-372). h5py reads release the GIL, so threads (not
processes) saturate disk + decode while the chip trains.

Behavioral parity targets (reference: data.py):
  * file discovery + .dd loading:  data.py:69,170-173. deepdish saves a
    {'data': ndarray} dict as a '/data' HDF5 node; read directly with h5py
    (no deepdish dependency, sidestepping its numpy>=1.20 breakage noted at
    preprocessing.py:103-107).
  * category filter by the 5th '_'-token of the filename: data.py:139-152.
  * voxel min-max normalization incl. constant-grid guard: data.py:177-181.
  * voxels fast path (no augs): data.py:183-184 -> (1 channel last) 32^3.
  * voxel -> integer-coordinate point cloud: data.py:213-218.
  * point_cloud -> voxel with axis swap [z, y, x]: data.py:220-228.
  * unit-sphere normalization: data.py:230-238.
  * random up/down-sampling to num_points: data.py:240-254.
  * jitter / rotate-about-y augmentations: data.py:288-307.
  * 80/20 split, batch 16, seed 24: data.py:352-360, train scripts.

Layout note: voxel batches are channel-LAST (B, 32, 32, 32, 1) for TPU convs
(the reference is channel-first (B, 1, 32, 32, 32)).
"""

from __future__ import annotations

import os
import threading
import queue as queue_mod
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, List, Optional, Sequence

import numpy as np

from shapegen_tpu.data.synsets import SHAPENET_ID_TO_CATEGORY

try:
    import h5py
except ImportError:  # pragma: no cover - baked into the image
    h5py = None


def load_dd(path: str) -> np.ndarray:
    """Load the 'data' array from a deepdish/pytables or plain h5py file."""
    if h5py is None:
        raise RuntimeError("h5py is required to read .dd files")
    with h5py.File(path, "r") as f:
        if "data" in f:
            return np.asarray(f["data"])
        # deepdish sometimes nests under attrs-tagged groups; fall back to the
        # first dataset found.
        for key in f.keys():
            if isinstance(f[key], h5py.Dataset):
                return np.asarray(f[key])
    raise ValueError(f"No dataset found in {path}")


#: Root-group attribute deepdish stamps on every file it writes
#: (deepdish/io/hdf5io.py ``IO_VERSION``); the reference's .dd datasets all
#: carry it. Written by save_dd for byte-layout parity and asserted readable
#: by tests/test_data.py's authentic-fixture interop tests.
DEEPDISH_IO_VERSION = 12


def save_dd(path: str, data: np.ndarray) -> None:
    """Save an array as the 'data' node, in the deepdish/pytables layout.

    The reference writes its datasets with ``dd.io.save(path, {'data': x})``
    (preprocessing.py:103-107) and reads them with ``dd.io.load(path)['data']``
    (data.py:170-173). deepdish is a thin shim over pytables: the dict value
    becomes a ``/data`` CArray (chunked, zlib-9 + shuffle filters, attrs
    CLASS='CARRAY'/VERSION='1.1'/TITLE='') and the root group carries the
    pytables format attrs plus ``DEEPDISH_IO_VERSION``. This writer emits
    that exact structure with h5py (no pytables/deepdish dependency), so the
    output is indistinguishable from an authentic deepdish file to both
    toolchains: ``dd.io.load`` maps the chunked dataset to ``tables.CArray``
    (a ``tables.Array`` subclass, returned as ``node[:]`` by deepdish's
    ``_load_level``) and keys the dict on the node name 'data'."""
    if h5py is None:
        raise RuntimeError("h5py is required to write .dd files")
    data = np.asarray(data)
    with h5py.File(path, "w") as f:
        # pytables root-group attrs (tables/group.py RootGroup) + deepdish's
        # version stamp (hdf5io.py save()).
        f.attrs.create("CLASS", np.bytes_("GROUP"))
        f.attrs.create("PYTABLES_FORMAT_VERSION", np.bytes_("2.1"))
        f.attrs.create("TITLE", np.bytes_(""))
        f.attrs.create("VERSION", np.bytes_("1.0"))
        f.attrs.create("DEEPDISH_IO_VERSION", np.int64(DEEPDISH_IO_VERSION))
        # deepdish _save_ndarray -> create_carray with
        # Filters(complevel=9, complib='zlib', shuffle=True): a chunked
        # dataset with gzip+shuffle, tagged with pytables CArray attrs.
        ds = f.create_dataset(
            "data", data=data, chunks=True if data.ndim else None,
            compression="gzip" if data.ndim else None,
            compression_opts=9 if data.ndim else None,
            shuffle=bool(data.ndim),
        )
        ds.attrs.create("CLASS", np.bytes_("CARRAY"))
        ds.attrs.create("TITLE", np.bytes_(""))
        ds.attrs.create("VERSION", np.bytes_("1.1"))


def normalize_point_cloud_np(pc: np.ndarray) -> np.ndarray:
    """Unit-sphere normalization (data.py:230-238)."""
    centroid = pc.mean(axis=0)
    pc = pc - centroid
    furthest = np.sqrt((pc**2).sum(axis=1)).max()
    return pc / furthest


def sample_point_cloud_np(
    pc: np.ndarray, num_points: int, rng: np.random.Generator
) -> np.ndarray:
    """Random down-sample without / up-sample with replacement (data.py:240-254)."""
    n = len(pc)
    if n == num_points:
        return pc
    if n > num_points:
        idx = rng.choice(n, num_points, replace=False)
        return pc[idx]
    extra = rng.choice(n, num_points - n, replace=True)
    idx = np.concatenate([np.arange(n), extra])
    return pc[idx]


def jitter_points_np(
    pc: np.ndarray, rng: np.random.Generator, sigma=0.01, clip=0.05
) -> np.ndarray:
    return pc + np.clip(sigma * rng.standard_normal(pc.shape), -clip, clip)


def rotate_around_y_np(pc: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    angle = rng.uniform() * 2 * np.pi
    c, s = np.cos(angle), np.sin(angle)
    rot = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
    return pc @ rot


class PointCloudDataModule:
    """In-memory data module over a preloaded point-cloud array
    (legacy; data.py:12-46)."""

    def __init__(self, point_clouds, batch_size: int = 32,
                 train_val_split: float = 0.8, seed: int = 24):
        self.point_clouds = np.asarray(point_clouds, np.float32)
        self.batch_size = batch_size
        self.train_val_split = train_val_split
        self.seed = seed
        self.train_data = None
        self.val_data = None

    def setup(self, stage=None):
        n = len(self.point_clouds)
        perm = np.random.default_rng(self.seed).permutation(n)
        train_size = int(self.train_val_split * n)
        self.train_data = self.point_clouds[perm[:train_size]]
        self.val_data = self.point_clouds[perm[train_size:]]

    def _batches(self, data, shuffle):
        order = np.arange(len(data))
        if shuffle:
            order = np.random.default_rng(self.seed).permutation(order)
        for i in range(0, len(order), self.batch_size):
            yield data[order[i : i + self.batch_size]]

    def train_dataloader(self):
        return self._batches(self.train_data, shuffle=True)

    def val_dataloader(self):
        return self._batches(self.val_data, shuffle=False)


class PointCloudDataset:
    """Per-file lazy dataset over a directory of .dd files (data.py:48-307).

    sampling: 'random' (default, data.py:240-254) or 'fps' — the reference's
    slow in-loader FPS option (data.py:256-286, "makes dataloading very
    slow"); here it calls the native C++ FPS so it is actually usable.
    """

    def __init__(
        self,
        data_dir: str,
        num_points: int = 2048,
        input_mode: str = "voxels",
        output_mode: str = "voxels",
        normalize: bool = True,
        jitter: bool = True,
        rotate: bool = False,
        resolution: int = 32,
        relevant_object_categories: Optional[Sequence[str]] = None,
        seed: int = 24,
        sampling: str = "random",
        return_labels: bool = False,
    ):
        self.data_dir = data_dir
        self.num_points = num_points
        self.input_mode = input_mode
        self.output_mode = output_mode
        self.normalize = normalize
        self.jitter = jitter
        self.rotate = rotate
        self.resolution = resolution
        self.categories = list(relevant_object_categories or ["all"])
        if sampling not in ("random", "fps"):
            raise ValueError(f"sampling must be 'random' or 'fps', got {sampling!r}")
        self.sampling = sampling
        # Category conditioning extension: label = index of the synset id in
        # the sorted 55-class map (stable across runs/categories).
        self.return_labels = return_labels
        self._synset_to_label = {
            sid: i for i, sid in enumerate(sorted(SHAPENET_ID_TO_CATEGORY))
        }
        self._rng = np.random.default_rng(seed)
        self._rng_lock = threading.Lock()

        self.file_list = sorted(
            f for f in os.listdir(data_dir) if f.endswith(".dd")
        )
        self._filter_file_list()

    def _filter_file_list(self):
        # data.py:139-152: filter by the 5th '_'-token synset id.
        if self.input_mode != "voxels" or self.categories == ["all"]:
            return
        self.file_list = [
            f
            for f in self.file_list
            if SHAPENET_ID_TO_CATEGORY.get(f.split("_")[4]) in self.categories
        ]

    def __len__(self):
        return len(self.file_list)

    def _child_rng(self) -> np.random.Generator:
        with self._rng_lock:
            return np.random.default_rng(self._rng.integers(0, 2**63))

    def label_for(self, idx: int) -> int:
        """Category index for the idx-th file (55-class global indexing)."""
        synset = self.file_list[idx].split("_")[4]
        return self._synset_to_label.get(synset, len(self._synset_to_label))

    def __getitem__(self, idx: int):
        out = self._get_sample(idx)
        if self.return_labels:
            return out, np.int32(self.label_for(idx))
        return out

    def _get_sample(self, idx: int) -> np.ndarray:
        path = os.path.join(self.data_dir, self.file_list[idx])
        rng = self._child_rng()

        # Per-sample resolution stays LOCAL: _get_sample runs concurrently on
        # prefetch-pool threads, so writing self.resolution here would let one
        # file's resolution leak into another's re-voxelization.
        res = self.resolution
        if self.input_mode == "voxels":
            voxels = load_dd(path).astype(np.float32)
            res = voxels.shape[0]
            vmin, vmax = voxels.min(), voxels.max()
            if vmin == vmax:
                voxels = np.full_like(voxels, vmin)
            else:
                voxels = (voxels - vmin) / (vmax - vmin)

            if self.output_mode == "voxels" and not (self.jitter or self.rotate):
                # Fast path (data.py:183-184); channel-last for TPU convs.
                return voxels[..., None]

            # Integer-coordinate occupied cells (data.py:213-218).
            point_cloud = np.argwhere(voxels > 0.5).astype(np.float32)
        elif self.input_mode == "point_clouds":
            point_cloud = load_dd(path).astype(np.float32)
        else:
            raise ValueError("Invalid input_mode for PointCloudDataset")

        if self.rotate:
            point_cloud = normalize_point_cloud_np(point_cloud)
            point_cloud = rotate_around_y_np(point_cloud, rng)
        if self.jitter:
            point_cloud = jitter_points_np(point_cloud, rng)

        if self.output_mode == "voxels":
            pts = (point_cloud + 1) * (res - 1) / 2
            pts = np.clip(pts, 0, res - 1).astype(int)
            grid = np.zeros((res, res, res), np.float32)
            grid[pts[:, 2], pts[:, 1], pts[:, 0]] = 1  # axis swap, data.py:227
            return grid[..., None]
        if self.output_mode == "point_clouds":
            if self.normalize:
                point_cloud = normalize_point_cloud_np(point_cloud)
            if self.sampling == "fps" and len(point_cloud) > self.num_points:
                from shapegen_tpu.native import fps_indices

                idx = fps_indices(
                    point_cloud.astype(np.float32), self.num_points,
                    start_idx=int(rng.integers(0, len(point_cloud))),
                )
                return point_cloud[idx].astype(np.float32)
            return sample_point_cloud_np(
                point_cloud, self.num_points, rng
            ).astype(np.float32)
        raise ValueError("Invalid output_mode for PointCloudDataset")


class _PrefetchLoader:
    """Thread-pool batch loader with bounded prefetch."""

    def __init__(
        self,
        dataset: PointCloudDataset,
        indices: np.ndarray,
        batch_size: int,
        shuffle: bool,
        num_workers: int,
        seed: int,
        drop_last: bool = False,
        prefetch: int = 2,
    ):
        self.dataset = dataset
        self.indices = np.asarray(indices)
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.prefetch = prefetch
        self._epoch_rng = np.random.default_rng(seed)

    def __len__(self):
        n = len(self.indices)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[np.ndarray]:
        order = self.indices
        if self.shuffle:
            order = self._epoch_rng.permutation(order)
        batches: List[np.ndarray] = [
            order[i : i + self.batch_size]
            for i in range(0, len(order), self.batch_size)
        ]
        if self.drop_last and batches and len(batches[-1]) < self.batch_size:
            batches.pop()

        out_q: "queue_mod.Queue" = queue_mod.Queue(maxsize=self.prefetch)
        sentinel = object()

        def produce():
            with ThreadPoolExecutor(self.num_workers) as pool:
                for batch_idx in batches:
                    samples = list(pool.map(self.dataset.__getitem__, batch_idx))
                    if isinstance(samples[0], tuple):
                        out_q.put(
                            tuple(np.stack(parts) for parts in zip(*samples))
                        )
                    else:
                        out_q.put(np.stack(samples))
            out_q.put(sentinel)

        thread = threading.Thread(target=produce, daemon=True)
        thread.start()
        while True:
            item = out_q.get()
            if item is sentinel:
                break
            yield item
        thread.join()


class PointCloudDataDirectoryModule:
    """Directory-backed data module (data.py:309-372): builds the dataset,
    makes the deterministic 80/20 split, and hands out prefetching loaders."""

    def __init__(
        self,
        data_dir: str,
        num_points: int = 2048,
        batch_size: int = 32,
        num_workers: int = 4,
        train_val_split: float = 0.8,
        file_mode: str = "voxels",
        output_mode: str = "point_clouds",
        augmentations: bool = True,
        normalization: bool = True,
        relevant_object_categories: Optional[Sequence[str]] = None,
        seed: int = 24,
        drop_last_train: bool = False,
        return_labels: bool = False,
    ):
        self.data_dir = data_dir
        self.num_points = num_points
        self.batch_size = batch_size
        self.num_workers = num_workers
        self.train_val_split = train_val_split
        self.file_mode = file_mode
        self.output_mode = output_mode
        self.augmentations = augmentations
        self.normalization = normalization
        self.relevant_object_categories = relevant_object_categories
        self.seed = seed
        self.drop_last_train = drop_last_train
        self.return_labels = return_labels
        self.dataset: Optional[PointCloudDataset] = None

    def setup(self):
        self.dataset = PointCloudDataset(
            self.data_dir,
            num_points=self.num_points,
            input_mode=self.file_mode,
            output_mode=self.output_mode,
            normalize=self.normalization,
            jitter=self.augmentations,
            rotate=False,  # reference: rotate defaults off either way
            relevant_object_categories=self.relevant_object_categories,
            seed=self.seed,
            return_labels=self.return_labels,
        )
        n = len(self.dataset)
        perm = np.random.default_rng(self.seed).permutation(n)
        train_size = int(self.train_val_split * n)
        self.train_indices = perm[:train_size]
        self.val_indices = perm[train_size:]

        # Multi-host (DCN): the split above is seeded identically on every
        # process; each host then takes a disjoint round-robin shard of it,
        # equalized in length so all hosts run the same number of batches
        # (SPMD lockstep). Global batches are assembled from the per-host
        # locals by parallel.shard_batch / global_batch_from_local.
        import jax

        if jax.process_count() > 1:
            from shapegen_tpu.parallel.distributed import shard_for_host

            # Equalized sharding truncates to len // process_count; a split
            # smaller than the pod would give every host zero samples —
            # undefined val_loss (breaking the plateau scheduler and the val
            # top-k monitor) or a zero-step train epoch. Fail loudly instead.
            for split_name, idx in (
                ("val", self.val_indices), ("train", self.train_indices)
            ):
                if len(idx) < jax.process_count():
                    raise ValueError(
                        f"{split_name} split has {len(idx)} samples but "
                        f"{jax.process_count()} processes — every host needs "
                        "at least one; use a larger dataset or fewer hosts"
                    )
            self.train_indices = shard_for_host(self.train_indices, equalize=True)
            self.val_indices = shard_for_host(self.val_indices, equalize=True)

    def train_dataloader(self) -> _PrefetchLoader:
        assert self.dataset is not None, "call setup() first"
        return _PrefetchLoader(
            self.dataset,
            self.train_indices,
            self.batch_size,
            shuffle=True,
            num_workers=self.num_workers,
            seed=self.seed,
            drop_last=self.drop_last_train,
        )

    def val_dataloader(self) -> _PrefetchLoader:
        assert self.dataset is not None, "call setup() first"
        return _PrefetchLoader(
            self.dataset,
            self.val_indices,
            self.batch_size,
            shuffle=False,
            num_workers=self.num_workers,
            seed=self.seed + 1,
        )
