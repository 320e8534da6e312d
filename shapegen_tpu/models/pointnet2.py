"""PointNet++ building blocks: SetAbstraction and FeaturePropagation.

Parity targets:
  * SetAbstraction     <- networks.py:182-309. FPS -> kNN grouping (the
                          reference ignores `radius` and kNNs by argsort of
                          the full pairwise distances, networks.py:247-248 —
                          preserved) -> shared MLP -> max-pool per group.
                          The (npoint=None) "global" variant pools all points.
  * FeaturePropagation <- networks.py:311-384. Inverse-distance-weighted
                          3-NN interpolation + shared MLP.

Layout: channel-last. xyz (B, N, 3), features (B, N, D).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from shapegen_tpu.models.layers import DenseBN
from shapegen_tpu.ops import geometry

Dtype = Any


class SetAbstraction(nn.Module):
    npoint: Optional[int]
    radius: Optional[float]  # kept for API parity; unused (networks.py:247 TODO)
    nsample: Optional[int]
    mlp: Sequence[int]
    first_layer: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        xyz: jnp.ndarray,
        points: Optional[jnp.ndarray],
        train: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        if self.npoint is None:
            return self._forward_global(xyz, points, train)
        return self._forward_local(xyz, points, train)

    def _forward_local(self, xyz, points, train):
        B, N, _ = xyz.shape
        S = min(self.npoint, N)

        if self.has_rng("fps"):
            fps_key = self.make_rng("fps")
            fps_idx = geometry.farthest_point_sample(xyz, S, key=fps_key)
        else:
            fps_idx = geometry.farthest_point_sample(xyz, S, deterministic_start=True)
        new_xyz = geometry.index_points(xyz, fps_idx)  # (B, S, 3)

        _, idx = geometry.knn(new_xyz, xyz, self.nsample)  # (B, S, K)
        grouped_xyz = geometry.index_points(xyz, idx)  # (B, S, K, 3)
        grouped_xyz_norm = grouped_xyz - new_xyz[:, :, None, :]

        if points is not None:
            grouped_points = geometry.index_points(points, idx)  # (B, S, K, D)
            grouped = jnp.concatenate([grouped_points, grouped_xyz_norm], axis=-1)
        else:
            grouped = grouped_xyz_norm

        h = grouped.astype(self.dtype)
        for f in self.mlp:
            h = DenseBN(f, dtype=self.dtype)(h, train)
        new_points = jnp.max(h, axis=2)  # (B, S, D')
        return new_xyz, new_points

    def _forward_global(self, xyz, points, train):
        if points is not None:
            h = jnp.concatenate([xyz, points], axis=-1)
        else:
            h = xyz
        h = h.astype(self.dtype)
        for f in self.mlp:
            h = DenseBN(f, dtype=self.dtype)(h, train)
        new_points = jnp.max(h, axis=1)  # (B, D')
        return xyz, new_points


class FeaturePropagation(nn.Module):
    mlp: Sequence[int]
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        xyz1: jnp.ndarray,  # (B, N, 3) targets
        xyz2: jnp.ndarray,  # (B, S, 3) sources
        points1: Optional[jnp.ndarray],  # (B, N, D1) or None
        points2: jnp.ndarray,  # (B, S, D2) or (B, 1, D2)
        train: bool = False,
    ) -> jnp.ndarray:
        B, N, _ = xyz1.shape
        S = xyz2.shape[1]

        if points2.shape[1] == 1 and S != 1:
            points2 = jnp.broadcast_to(points2, (B, S, points2.shape[-1]))

        if S == 1:
            interpolated = jnp.broadcast_to(points2, (B, N, points2.shape[-1]))
        else:
            dists, idx = geometry.knn(xyz1, xyz2, 3)  # ascending (B, N, 3)
            dist_recip = 1.0 / (dists + 1e-8)
            norm = jnp.sum(dist_recip, axis=2, keepdims=True)
            weight = dist_recip / norm
            indexed = geometry.index_points(points2, idx)  # (B, N, 3, D)
            interpolated = jnp.sum(indexed * weight[..., None], axis=2)

        if points1 is not None:
            h = jnp.concatenate([points1, interpolated], axis=-1)
        else:
            h = interpolated

        h = h.astype(self.dtype)
        for f in self.mlp:
            h = DenseBN(f, dtype=self.dtype)(h, train)
        return h
