"""Geometry kernels: the reference's performance-critical torch/numpy ops,
re-designed for XLA/TPU with static shapes.

Behavioral parity targets (reference file:line):
  * square_distance:        utils.py:444-455 (cdist^2) — here the matmul form
                            |s|^2 + |d|^2 - 2 s.d, which tiles onto the MXU.
  * index_points:           utils.py:397-416 (fancy gather) -> take_along_axis.
  * knn:                    utils.py:457-486 (chunked cdist + topk) -> one
                            fused top_k over blocked matmul distances; no
                            host sync (the reference had a stray
                            cuda.synchronize at utils.py:482).
  * farthest_point_sample:  utils.py:418-442 — inherently sequential over
                            npoint; lax.fori_loop with batched argmax.
  * voxelize:               utils.py:488-509 — the reference loops over the
                            batch in Python; here one batched scatter-max.
                            NOTE: the reference uses this inside a training
                            loss where it is non-differentiable (scatter of
                            constants); we preserve that (stop-gradient
                            semantics are implicit — integer indices).
  * voxel_to_points_padded: utils.py:511-538 returns a ragged Python list;
                            ragged shapes don't exist under XLA, so this
                            returns a fixed-capacity (max_points, 3) buffer +
                            validity mask + count, in the same row-major
                            (z, y, x)-scan order, with the same
                            stack([x, y, z]) column order and [-1, 1]
                            normalization. De-pad only at host edges.
  * point_cloud_to_voxel:   utils.py:102-126 — voxelize + 3^3 max dilation
                            (scipy maximum_filter -> lax.reduce_window).
  * normalize_to_cube:      metrics.py:7-21.
  * normalize_unit_sphere:  data.py:230-238 / preprocessing.py:44-58.
  * sample_to_fixed_size:   data.py:240-254 — random down-sample without
                            replacement / up-sample with replacement.
  * rotate_around_y / jitter_points: data.py:288-307 augmentations.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def square_distance(src: jnp.ndarray, dst: jnp.ndarray) -> jnp.ndarray:
    """Pairwise squared Euclidean distances, (B, N, C) x (B, M, C) -> (B, N, M)."""
    s2 = jnp.sum(src * src, axis=-1, keepdims=True)  # (B, N, 1)
    d2 = jnp.sum(dst * dst, axis=-1)[..., None, :]  # (B, 1, M)
    cross = jnp.einsum(
        "bnc,bmc->bnm",
        src,
        dst,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return jnp.maximum(s2 + d2 - 2.0 * cross, 0.0)


def index_points(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather points by index: points (B, N, C), idx (B, S) or (B, S, K).

    Returns (B, S, C) or (B, S, K, C), matching utils.py:397-416.
    """
    if idx.ndim == 2:
        return jnp.take_along_axis(points, idx[..., None], axis=1)
    if idx.ndim == 3:
        B, S, K = idx.shape
        flat = jnp.take_along_axis(points, idx.reshape(B, S * K, 1), axis=1)
        return flat.reshape(B, S, K, points.shape[-1])
    raise ValueError(f"idx must be rank 2 or 3, got {idx.ndim}")


def knn(src: jnp.ndarray, dst: jnp.ndarray, k: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """k nearest neighbors of each src point among dst points.

    Returns (squared distances, indices), each (B, N, k), ascending by
    distance — the reference's topk(largest=False) (utils.py:484).
    """
    dists = square_distance(src, dst)
    neg, idx = jax.lax.top_k(-dists, k)
    return -neg, idx


def farthest_point_sample(
    xyz: jnp.ndarray,
    npoint: int,
    key: Optional[jax.Array] = None,
    deterministic_start: bool = False,
) -> jnp.ndarray:
    """FPS indices, (B, N, 3) -> (B, npoint) int32 (utils.py:418-442).

    The reference starts from a uniformly random point per cloud; pass a key
    for that, or deterministic_start=True to start at index 0 (useful for
    reproducible tests).
    """
    B, N, _ = xyz.shape
    if deterministic_start or key is None:
        farthest = jnp.zeros((B,), jnp.int32)
    else:
        farthest = jax.random.randint(key, (B,), 0, N, dtype=jnp.int32)

    centroids = jnp.zeros((B, npoint), jnp.int32)
    distance = jnp.full((B, N), 1e10, jnp.float32)

    def body(i, state):
        centroids, distance, farthest = state
        centroids = centroids.at[:, i].set(farthest)
        centroid = jnp.take_along_axis(xyz, farthest[:, None, None], axis=1)  # (B,1,3)
        dist = jnp.sum((xyz - centroid) ** 2, axis=-1)
        distance = jnp.minimum(distance, dist)
        farthest = jnp.argmax(distance, axis=-1).astype(jnp.int32)
        return centroids, distance, farthest

    centroids, _, _ = jax.lax.fori_loop(0, npoint, body, (centroids, distance, farthest))
    return centroids


def voxelize(points: jnp.ndarray, voxel_resolution: int = 32) -> jnp.ndarray:
    """Point cloud -> occupancy grid, (B, N, 3) in [-1,1] -> (B, R, R, R).

    One batched scatter (no Python loop, unlike utils.py:506-507). Values are
    {0., 1.} float32. Indices follow the reference: truncation toward zero via
    the clamp to [0, R-1] (utils.py:501-502 uses .long().clamp, which agrees
    with floor+clip for all values that survive the clamp).
    """
    if points.ndim == 2:
        points = points[None]
    R = voxel_resolution
    scaled = (points + 1.0) * (R - 1) / 2.0
    idx = jnp.clip(jnp.floor(scaled).astype(jnp.int32), 0, R - 1)
    B, N, _ = idx.shape
    flat = (idx[..., 0] * R + idx[..., 1]) * R + idx[..., 2]  # (B, N)
    grids = jnp.zeros((B, R * R * R), jnp.float32)
    grids = jax.vmap(lambda g, f: g.at[f].set(1.0))(grids, flat)
    return grids.reshape(B, R, R, R)


def dilate_voxels(voxels: jnp.ndarray, size: int = 3) -> jnp.ndarray:
    """3D max dilation, the reference's ndimage.maximum_filter (utils.py:124)."""
    squeeze = voxels.ndim == 3
    if squeeze:
        voxels = voxels[None]
    out = jax.lax.reduce_window(
        voxels,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, size, size, size),
        window_strides=(1, 1, 1, 1),
        padding="SAME",
    )
    return out[0] if squeeze else out


def point_cloud_to_voxel(
    points: jnp.ndarray, dims: int = 32, dilate: bool = True
) -> jnp.ndarray:
    """Point cloud -> voxel grid with optional 3^3 dilation (utils.py:102-126).

    The reference's utils variant rounds (np.round) rather than truncating;
    we follow round here to match utils.py:117.
    """
    squeeze = points.ndim == 2
    if squeeze:
        points = points[None]
    R = dims
    scaled = (points + 1.0) * (R - 1) / 2.0
    idx = jnp.round(scaled).astype(jnp.int32)
    in_bounds = jnp.all((idx >= 0) & (idx < R), axis=-1)  # (B, N)
    idx = jnp.clip(idx, 0, R - 1)
    flat = (idx[..., 0] * R + idx[..., 1]) * R + idx[..., 2]
    vals = in_bounds.astype(jnp.float32)
    grids = jnp.zeros((points.shape[0], R * R * R), jnp.float32)
    grids = jax.vmap(lambda g, f, v: g.at[f].max(v))(grids, flat, vals)
    grids = grids.reshape(-1, R, R, R)
    if dilate:
        grids = dilate_voxels(grids)
    return grids[0] if squeeze else grids


def voxel_to_points_padded(
    voxels: jnp.ndarray,
    max_points: int,
    threshold: float = 0.5,
    normalize: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Occupancy grid(s) -> fixed-capacity point buffers + masks.

    voxels: (D, H, W) or (B, D, H, W). Returns (points, mask, count) with
    points (B, max_points, 3), mask (B, max_points) bool, count (B,) int32.

    Matches utils.py:511-538: occupied cells in row-major (z, y, x) scan
    order, columns stacked as [x, y, z], normalized to [-1, 1] by
    [W-1, H-1, D-1] when `normalize`. Padded rows are zeros with mask False.
    If a grid has more than max_points occupied cells, the first max_points
    in scan order are kept (count saturates at max_points).
    """
    squeeze = voxels.ndim == 3
    if squeeze:
        voxels = voxels[None]
    B, D, H, W = voxels.shape
    occ = (voxels > threshold).reshape(B, -1)

    # top_k over {0,1} with index tiebreak yields the first `count` occupied
    # flat indices in ascending scan order.
    occ_f = occ.astype(jnp.float32)
    vals, flat_idx = jax.lax.top_k(occ_f, max_points)
    mask = vals > 0.5
    count = jnp.sum(occ, axis=-1).astype(jnp.int32)
    count = jnp.minimum(count, max_points)

    z = (flat_idx // (H * W)).astype(jnp.float32)
    y = ((flat_idx // W) % H).astype(jnp.float32)
    x = (flat_idx % W).astype(jnp.float32)
    points = jnp.stack([x, y, z], axis=-1)
    if normalize:
        denom = jnp.array([W - 1, H - 1, D - 1], jnp.float32)
        points = 2.0 * points / denom - 1.0
    points = jnp.where(mask[..., None], points, 0.0)
    if squeeze:
        return points[0], mask[0], count[0]
    return points, mask, count


def normalize_to_cube(points: jnp.ndarray) -> jnp.ndarray:
    """Center by (max+min)/2 per axis, scale by the global max abs (metrics.py:7-21)."""
    center = (
        jnp.max(points, axis=-2, keepdims=True) + jnp.min(points, axis=-2, keepdims=True)
    ) / 2.0
    points = points - center
    scale = jnp.max(jnp.abs(points), axis=(-2, -1), keepdims=True)
    return points / scale


def normalize_unit_sphere(points: jnp.ndarray) -> jnp.ndarray:
    """Center by centroid, scale by furthest distance (data.py:230-238)."""
    centroid = jnp.mean(points, axis=-2, keepdims=True)
    points = points - centroid
    furthest = jnp.max(
        jnp.sqrt(jnp.sum(points**2, axis=-1, keepdims=True)), axis=-2, keepdims=True
    )
    return points / furthest


def masked_normalize_unit_sphere(
    points: jnp.ndarray, mask: jnp.ndarray
) -> jnp.ndarray:
    """normalize_unit_sphere over only the valid (mask=True) points.

    Needed because padded zeros would otherwise shift the centroid. Padded
    rows stay zero.
    """
    m = mask[..., None].astype(points.dtype)
    n = jnp.maximum(jnp.sum(m, axis=-2, keepdims=True), 1.0)
    centroid = jnp.sum(points * m, axis=-2, keepdims=True) / n
    centered = (points - centroid) * m
    furthest = jnp.max(
        jnp.sqrt(jnp.sum(centered**2, axis=-1, keepdims=True)),
        axis=-2,
        keepdims=True,
    )
    furthest = jnp.maximum(furthest, 1e-12)
    return centered / furthest


def sample_to_fixed_size(
    key: jax.Array,
    points: jnp.ndarray,
    mask: jnp.ndarray,
    num_points: int,
) -> jnp.ndarray:
    """Random resample of a padded cloud to exactly num_points (data.py:240-254).

    points (P, 3) with validity mask (P,). If count >= num_points: a uniform
    random subset without replacement. If count < num_points: every valid
    point appears, the remainder cycling through a random permutation
    (the reference tops up with replacement; here the top-up cycles a
    shuffle, which has the same support and avoids dynamic shapes).
    """
    P = points.shape[0]
    priorities = jax.random.uniform(key, (P,))
    priorities = jnp.where(mask, priorities, jnp.inf)  # invalid sorts last
    order = jnp.argsort(priorities)
    count = jnp.maximum(jnp.sum(mask.astype(jnp.int32)), 1)
    take = order[jnp.arange(num_points) % count]
    return points[take]


def rotate_around_y(key: jax.Array, points: jnp.ndarray) -> jnp.ndarray:
    """Random rotation about the vertical (y) axis (data.py:296-307)."""
    angle = jax.random.uniform(key, ()) * 2.0 * jnp.pi
    c, s = jnp.cos(angle), jnp.sin(angle)
    rot = jnp.array([[c, 0.0, s], [0.0, 1.0, 0.0], [-s, 0.0, c]])
    return jnp.matmul(points, rot, precision=jax.lax.Precision.HIGHEST)


def jitter_points(
    key: jax.Array, points: jnp.ndarray, sigma: float = 0.01, clip: float = 0.05
) -> jnp.ndarray:
    """Clipped Gaussian jitter (data.py:288-294)."""
    noise = jnp.clip(sigma * jax.random.normal(key, points.shape), -clip, clip)
    return points + noise


@functools.partial(jax.jit, static_argnums=(1,))
def voxelize_jit(points: jnp.ndarray, voxel_resolution: int = 32) -> jnp.ndarray:
    return voxelize(points, voxel_resolution)
