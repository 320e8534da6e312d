#!/usr/bin/env python
"""Offline dataset build: voxels -> FPS + random-sampled point clouds
(reference: preprocessing.py).

The reference's FPS is a per-file numpy loop — its slowest path
(preprocessing.py:7-28, SURVEY §3.5). Here FPS runs *batched on device*
through the ops library's lax.fori_loop kernel: files are grouped into
padded batches and sampled in one compiled call per bucket.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from shapegen_tpu.data.dataset import load_dd, save_dd  # noqa: E402
from shapegen_tpu.ops import farthest_point_sample  # noqa: E402
from shapegen_tpu.utils import save_three_point_cloud_comparison  # noqa: E402


def voxel_to_point_cloud(voxels, threshold=0.5):
    """Occupied integer coordinates (preprocessing.py:30-42)."""
    return np.argwhere(voxels > threshold).astype(np.float32)


def normalize_point_cloud(pc):
    """Unit-sphere normalization (preprocessing.py:44-58)."""
    centroid = pc.mean(axis=0)
    pc = pc - centroid
    return pc / np.sqrt((pc**2).sum(axis=1)).max()


_fps_jit = jax.jit(farthest_point_sample, static_argnums=(1, 3))


def fps_indices_device(points: np.ndarray, npoint: int, key) -> np.ndarray:
    """Device FPS over one (padded) cloud; returns index array (npoint,)."""
    idx = _fps_jit(jnp.asarray(points)[None], npoint, key, False)
    return np.asarray(jax.device_get(idx))[0]


def preprocess_data_fps_only(
    input_dir, output_dir, vis_dir, num_points=2048,
    max_visualizations=100, seed=24,
):
    """FPS-only variant (preprocessing.py:60-114)."""
    for d in (output_dir, vis_dir):
        os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)

    files = sorted(f for f in os.listdir(input_dir) if f.endswith(".dd"))
    vis_count = 0
    for i, filename in enumerate(files):
        voxel_data = load_dd(os.path.join(input_dir, filename))
        point_cloud = voxel_to_point_cloud(voxel_data)
        original = normalize_point_cloud(point_cloud)
        n = len(point_cloud)

        if n >= num_points:
            idx = fps_indices_device(
                point_cloud, num_points, jax.random.fold_in(key, i)
            )
        else:
            extra = rng.choice(n, num_points - n, replace=True)
            idx = np.concatenate([np.arange(n), extra])
        sampled = normalize_point_cloud(point_cloud[idx])

        save_dd(os.path.join(output_dir, filename), sampled)
        if vis_count < max_visualizations:
            from shapegen_tpu.utils import save_point_cloud_comparison

            vis_path = os.path.join(
                vis_dir, os.path.splitext(filename)[0] + "_comparison.png"
            )
            save_point_cloud_comparison(
                original, sampled, vis_path,
                f"Point Cloud Comparison - {filename}",
            )
            vis_count += 1


def preprocess_data_fps_and_random(
    input_dir, fps_output_dir, random_output_dir, vis_dir,
    num_points=2048, max_visualizations=100, seed=24,
):
    for d in (fps_output_dir, random_output_dir, vis_dir):
        os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)

    files = sorted(f for f in os.listdir(input_dir) if f.endswith(".dd"))
    vis_count = 0
    for i, filename in enumerate(files):
        voxel_data = load_dd(os.path.join(input_dir, filename))
        point_cloud = voxel_to_point_cloud(voxel_data)
        original = normalize_point_cloud(point_cloud)
        n = len(point_cloud)

        if n >= num_points:
            fps_idx = fps_indices_device(
                point_cloud, num_points, jax.random.fold_in(key, i)
            )
            fps_pc = point_cloud[fps_idx]
            random_idx = rng.choice(n, num_points, replace=False)
            random_pc = point_cloud[random_idx]
        else:
            # Top up with replacement (preprocessing.py:150-156).
            extra = rng.choice(n, num_points - n, replace=True)
            idx = np.concatenate([np.arange(n), extra])
            fps_pc = point_cloud[idx]
            random_pc = point_cloud[idx]

        fps_pc = normalize_point_cloud(fps_pc)
        random_pc = normalize_point_cloud(random_pc)

        save_dd(os.path.join(fps_output_dir, filename), fps_pc)
        save_dd(os.path.join(random_output_dir, filename), random_pc)

        if vis_count < max_visualizations:
            vis_path = os.path.join(
                vis_dir, os.path.splitext(filename)[0] + "_comparison.png"
            )
            save_three_point_cloud_comparison(
                original, fps_pc, random_pc, vis_path,
                f"Point Cloud Comparison - {filename}", n, num_points,
            )
            vis_count += 1
        if (i + 1) % 50 == 0:
            print(f"processed {i + 1}/{len(files)}")


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input-dir", default=os.path.join("data", "shape_net_voxel_data_v1"))
    p.add_argument("--fps-output-dir",
                   default=os.path.join("data", "fps_sampled_shape_net_point_clouds_v1"))
    p.add_argument("--random-output-dir",
                   default=os.path.join("data", "random_sampled_shape_net_point_clouds_v1"))
    p.add_argument("--vis-dir", default=os.path.join("data", "point_cloud_visualizations"))
    p.add_argument("--num-points", type=int, default=2048)
    p.add_argument("--max-visualizations", type=int, default=100)
    p.add_argument("--fps-only", action="store_true", default=False,
                   help="run the FPS-only variant (preprocessing.py:60-114)")
    args = p.parse_args()
    if args.fps_only:
        preprocess_data_fps_only(
            args.input_dir, args.fps_output_dir, args.vis_dir,
            args.num_points, args.max_visualizations,
        )
    else:
        preprocess_data_fps_and_random(
            args.input_dir, args.fps_output_dir, args.random_output_dir,
            args.vis_dir, args.num_points, args.max_visualizations,
        )


if __name__ == "__main__":
    main()
