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


def get_coords(dims):
    """Meshgrid coordinates in [-1, 1]^3 (utils.py:8-26)."""
    if isinstance(dims, int):
        dims = np.array([dims, dims, dims])
    axes = [np.linspace(-1, 1, d) for d in dims]
    x1, y1, z1 = np.meshgrid(*axes)
    return np.stack([x1, y1, z1])


def voxel_grid_to_point_cloud(voxels, dims=None, threshold=0.5):
    """Occupied-cell coordinates in [-1, 1] space (utils.py:81-100 — the
    normalized meshgrid variant; for integer scan-order coordinates see
    native.voxels_to_points / ops.voxel_to_points_padded)."""
    voxels = _to_numpy(voxels)
    if dims is None:
        dims = np.array(voxels.shape[:3])
    coords = get_coords(dims)
    coords_flat = coords.reshape(3, -1).T
    return coords_flat[voxels.flatten() > threshold]


def plot_single_voxel_graph(ax, coords, voxels):
    """Scatter occupied cells onto an existing 3D axis (utils.py:46-61)."""
    mask = voxels > 0
    points = np.array([coords[0, mask], coords[1, mask], coords[2, mask]]).T
    ax.scatter(points[:, 0], points[:, 1], points[:, 2], s=1, c="k")
    return points


def plot_voxels(voxels, save_ply=False, ply_path="object.ply"):
    """Voxel scatter figure + optional PLY export (utils.py:63-79)."""
    fig = plt.figure()
    ax = fig.add_subplot(projection="3d")
    coords = get_coords(_to_numpy(voxels).shape[0])
    points = plot_single_voxel_graph(ax, coords, _to_numpy(voxels))
    if save_ply and len(points):
        save_to_ply(ply_path, points)
    return fig


def plot_3d(data, is_voxel=True):
    """Single 3D object figure (utils.py:128-154)."""
    fig = plt.figure(figsize=(8, 8))
    ax = fig.add_subplot(111, projection="3d")
    points = voxel_grid_to_point_cloud(data) if is_voxel else _to_numpy(data)
    if len(points):
        ax.scatter(points[:, 0], points[:, 1], points[:, 2], c="b", s=5)
    ax.set_xlabel("X")
    ax.set_ylabel("Y")
    ax.set_zlabel("Z")
    ax.set_xlim(-1, 1)
    ax.set_ylim(-1, 1)
    ax.set_zlim(-1, 1)
    ax.set_title("3D Object Visualization")
    return fig


def plot_multiple_3d(data_list, is_voxel=True, rows=1, cols=1):
    """Grid of 3D object figures (utils.py:156-188)."""
    fig = plt.figure(figsize=(6 * cols, 6 * rows))
    for i, data in enumerate(data_list):
        ax = fig.add_subplot(rows, cols, i + 1, projection="3d")
        points = voxel_grid_to_point_cloud(data) if is_voxel else _to_numpy(data)
        if len(points):
            ax.scatter(points[:, 0], points[:, 1], points[:, 2], c="b", s=5)
        ax.set_xlabel("X")
        ax.set_ylabel("Y")
        ax.set_zlabel("Z")
        ax.set_xlim(-1, 1)
        ax.set_ylim(-1, 1)
        ax.set_zlim(-1, 1)
        ax.set_title(f"Object {i + 1}")
    plt.tight_layout()
    return fig
