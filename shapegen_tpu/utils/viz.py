"""Host-side visualization + export (matplotlib / PLY / CSV).

Parity targets: utils.py:28-352 (plot_point_cloud_3d/2d, comparison figures,
PLY export) and utils.py:387-395 (CSV export). These run on host regardless
of backend; inputs may be jax arrays, numpy arrays, or anything np.asarray
accepts. Empty clouds (possible after voxel thresholding, utils.py:534-535)
produce empty-but-valid figures, like the reference (utils.py:302-303).
"""

from __future__ import annotations

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def _to_numpy(points) -> np.ndarray:
    return np.asarray(points, dtype=np.float32)


def plot_point_cloud_3d(point_cloud):
    pc = _to_numpy(point_cloud)
    fig = plt.figure(figsize=(8, 8))
    ax = fig.add_subplot(111, projection="3d")
    if len(pc) == 0:
        return fig
    ax.scatter(pc[:, 0], pc[:, 1], pc[:, 2], s=1)
    max_range = pc.max() - pc.min()
    mid = [(pc[:, i].max() + pc[:, i].min()) * 0.5 for i in range(3)]
    ax.set_xlim(mid[0] - max_range / 2, mid[0] + max_range / 2)
    ax.set_ylim(mid[1] - max_range / 2, mid[1] + max_range / 2)
    ax.set_zlim(mid[2] - max_range / 2, mid[2] + max_range / 2)
    ax.set_xlabel("X")
    ax.set_ylabel("Y")
    ax.set_zlabel("Z")
    return fig


def plot_point_cloud_2d(point_cloud):
    pc = _to_numpy(point_cloud)
    fig, (ax1, ax2, ax3) = plt.subplots(1, 3, figsize=(15, 5))
    if len(pc):
        ax1.scatter(pc[:, 0], pc[:, 1], s=1)
        ax2.scatter(pc[:, 0], pc[:, 2], s=1)
        ax3.scatter(pc[:, 1], pc[:, 2], s=1)
    for ax, (t, xl, yl) in zip(
        (ax1, ax2, ax3),
        (("XY Projection", "X", "Y"), ("XZ Projection", "X", "Z"),
         ("YZ Projection", "Y", "Z")),
    ):
        ax.set_title(t)
        ax.set_xlabel(xl)
        ax.set_ylabel(yl)
    plt.tight_layout()
    return fig


def _plot_single(ax, points, title=""):
    pc = _to_numpy(points)
    if len(pc) == 0:
        ax.set_title(title)
        return
    ax.scatter(pc[:, 0], pc[:, 1], pc[:, 2], s=1)
    max_range = pc.max() - pc.min()
    mid = [(pc[:, i].max() + pc[:, i].min()) * 0.5 for i in range(3)]
    ax.set_xlim(mid[0] - max_range / 2, mid[0] + max_range / 2)
    ax.set_ylim(mid[1] - max_range / 2, mid[1] + max_range / 2)
    ax.set_zlim(mid[2] - max_range / 2, mid[2] + max_range / 2)
    ax.set_xlabel("X")
    ax.set_ylabel("Y")
    ax.set_zlabel("Z")
    ax.set_title(title)


def plot_comparison_point_clouds(
    original, sampled, title, title1="Original Point Cloud",
    title2="Sampled Point Cloud",
):
    fig = plt.figure(figsize=(12, 6))
    ax1 = fig.add_subplot(121, projection="3d")
    ax2 = fig.add_subplot(122, projection="3d")
    _plot_single(ax1, original, title1)
    _plot_single(ax2, sampled, title2)
    plt.suptitle(title)
    plt.tight_layout()
    return fig


def save_point_cloud_comparison(
    original, sampled, output_path, title,
    title1="Original Point Cloud", title2="Sampled Point Cloud",
):
    fig = plot_comparison_point_clouds(original, sampled, title, title1, title2)
    plt.savefig(output_path)
    plt.close(fig)


def save_three_point_cloud_comparison(
    original, fps_sampled, random_sampled, output_path, title,
    num_original_points, num_points,
):
    fig = plt.figure(figsize=(18, 6))
    ax1 = fig.add_subplot(131, projection="3d")
    ax2 = fig.add_subplot(132, projection="3d")
    ax3 = fig.add_subplot(133, projection="3d")
    _plot_single(ax1, original, f"Original Point Cloud, n={num_original_points}")
    _plot_single(ax2, fps_sampled, f"FPS Sampled Point Cloud, n={num_points}")
    _plot_single(ax3, random_sampled, f"Random Sampled Point Cloud, n={num_points}")
    plt.suptitle(title)
    plt.tight_layout()
    plt.savefig(output_path)
    plt.close(fig)


def save_to_ply(filename, points):
    """PLY export (utils.py:28-44). Uses plyfile if present, else writes an
    ASCII PLY directly (same vertex schema)."""
    pc = _to_numpy(points)
    assert pc.ndim == 2 and pc.shape[1] == 3, "Points should be a Nx3 array"
    try:
        from plyfile import PlyData, PlyElement

        vertex = np.array(
            [tuple(p) for p in pc],
            dtype=[("x", "f4"), ("y", "f4"), ("z", "f4")],
        )
        PlyData([PlyElement.describe(vertex, "vertex")]).write(filename)
    except ImportError:
        with open(filename, "w") as f:
            f.write("ply\nformat ascii 1.0\n")
            f.write(f"element vertex {len(pc)}\n")
            f.write("property float x\nproperty float y\nproperty float z\n")
            f.write("end_header\n")
            for p in pc:
                f.write(f"{p[0]} {p[1]} {p[2]}\n")


def save_point_cloud(point_cloud, filename):
    """CSV export (utils.py:387-395)."""
    np.savetxt(filename, _to_numpy(point_cloud), delimiter=",")
