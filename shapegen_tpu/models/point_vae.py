"""Point-cloud VAEs.

Parity targets:
  * SimplePointNetVAE       <- networks.py:1110-1410. PointNet encoder
                               (4 PointNetLayers + global max) -> mu/logvar
                               (latent 256); MLP decoder -> N x 3. Loss =
                               chamfer + voxel-BCE + beta*KL (the voxel term
                               goes through a non-differentiable voxelize —
                               preserved, see metrics/losses).
  * PointNetVAE             <- networks.py:1511-1725. PointNet++ encoder
                               (networks.py:1412-1447) + FoldingNet decoder
                               (networks.py:1449-1509). The "point-cloud VAE"
                               option for the LDM (train_point_ldm.py:48).
  * PointNetVAEExperimental <- networks.py:1727-1982 (unused by entry points).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from shapegen_tpu.models.layers import (
    head_dtype,
    PointNetLayer,
    FoldingLayer,
    kaiming_out,
    xavier_normal_gain,
)
from shapegen_tpu.models.pointnet2 import FeaturePropagation, SetAbstraction
from shapegen_tpu.models.vae3d import reparameterize  # shared trick

Dtype = Any


class SimplePointNetVAE(nn.Module):
    num_points: int = 2048
    latent_dim: int = 256
    hidden_dim: int = 512
    dropout_rate: float = 0.1
    dtype: Dtype = jnp.float32

    def setup(self):
        self.enc1 = PointNetLayer(64, dtype=self.dtype)
        self.enc2 = PointNetLayer(128, dtype=self.dtype)
        self.enc3 = PointNetLayer(256, dtype=self.dtype)
        self.enc4 = PointNetLayer(self.hidden_dim, dtype=self.dtype)
        self.enc_fc = nn.Dense(
            self.hidden_dim // 2, kernel_init=kaiming_out, dtype=self.dtype
        )
        self.fc_mu = nn.Dense(
            self.latent_dim, kernel_init=xavier_normal_gain(0.01), dtype=head_dtype(self.dtype)
        )
        self.fc_logvar = nn.Dense(
            self.latent_dim, kernel_init=xavier_normal_gain(0.01), dtype=head_dtype(self.dtype)
        )
        self.dec1 = nn.Dense(self.hidden_dim // 2, kernel_init=kaiming_out, dtype=self.dtype)
        self.dec2 = nn.Dense(self.hidden_dim, kernel_init=kaiming_out, dtype=self.dtype)
        self.dec3 = nn.Dense(
            self.num_points * 3, kernel_init=kaiming_out, dtype=self.dtype
        )
        self.dropout = nn.Dropout(self.dropout_rate)
        self.output_layer = nn.Dense(
            self.num_points * 3, kernel_init=kaiming_out, dtype=head_dtype(self.dtype)
        )

    def encode(self, x, train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        # x: (B, N, 3)
        h = self.enc1(x.astype(self.dtype), train)
        h = self.enc2(h, train)
        h = self.enc3(h, train)
        h = self.enc4(h, train)
        h = jnp.max(h, axis=1)  # AdaptiveMaxPool1d(1) + Flatten
        h = nn.relu(self.enc_fc(h))
        return self.fc_mu(h), self.fc_logvar(h)

    def decode(self, z, train: bool = False) -> jnp.ndarray:
        h = nn.relu(self.dec1(z.astype(self.dtype)))
        h = nn.relu(self.dec2(h))
        h = nn.relu(self.dec3(h))
        h = self.dropout(h, deterministic=not train)
        out = self.output_layer(h)
        return out.reshape(-1, self.num_points, 3)

    def __call__(self, x, rng, train: bool = False):
        mu, logvar = self.encode(x, train)
        z = reparameterize(rng, mu, logvar)
        return self.decode(z, train), mu, logvar


class PointNetPPEncoder(nn.Module):
    """3-stage SetAbstraction encoder (networks.py:1412-1447)."""

    latent_dim: int = 256
    dtype: Dtype = jnp.float32

    def setup(self):
        self.sa1 = SetAbstraction(512, 0.2, 32, mlp=[64, 64, 128], dtype=self.dtype)
        self.sa2 = SetAbstraction(128, 0.4, 64, mlp=[128, 128, 256], dtype=self.dtype)
        self.sa3 = SetAbstraction(None, None, None, mlp=[256, 512, 1024], dtype=self.dtype)
        self.fc1 = nn.Dense(512, kernel_init=kaiming_out, dtype=self.dtype)
        self.bn1 = nn.BatchNorm(momentum=0.9, epsilon=1e-5, dtype=self.dtype)
        self.fc_mu = nn.Dense(
            self.latent_dim, kernel_init=xavier_normal_gain(0.01), dtype=head_dtype(self.dtype)
        )
        self.fc_logvar = nn.Dense(
            self.latent_dim, kernel_init=xavier_normal_gain(0.01), dtype=head_dtype(self.dtype)
        )

    def __call__(self, x, train: bool = False):
        # The reference feeds xyz as both coordinates and features
        # (networks.py:1440: self.sa1(x, x)).
        l1_xyz, l1_points = self.sa1(x, x, train)
        l2_xyz, l2_points = self.sa2(l1_xyz, l1_points, train)
        _, l3_points = self.sa3(l2_xyz, l2_points, train)
        h = self.fc1(l3_points)
        h = nn.relu(self.bn1(h, use_running_average=not train))
        return self.fc_mu(h), self.fc_logvar(h)


class FoldingDecoder(nn.Module):
    """FoldingNet decoder: 32x32 grid folded twice, Dense upsample to N
    (networks.py:1449-1509)."""

    latent_dim: int = 256
    num_points: int = 2048
    dtype: Dtype = jnp.float32

    def setup(self):
        gx, gy = jnp.meshgrid(
            jnp.linspace(-1.0, 1.0, 32), jnp.linspace(-1.0, 1.0, 32), indexing="ij"
        )
        self.grid = jnp.stack([gx, gy], axis=-1).reshape(-1, 2)  # (1024, 2)
        self.fold1 = [
            FoldingLayer(512, dtype=self.dtype),
            FoldingLayer(512, dtype=self.dtype),
            FoldingLayer(3, dtype=self.dtype),
        ]
        self.fold2 = [
            FoldingLayer(512, dtype=self.dtype),
            FoldingLayer(512, dtype=self.dtype),
            FoldingLayer(3, dtype=self.dtype),
        ]
        self.upsample = nn.Dense(
            self.num_points, kernel_init=kaiming_out, dtype=head_dtype(self.dtype)
        )

    def __call__(self, z):
        B = z.shape[0]
        grid = jnp.broadcast_to(self.grid[None], (B, 1024, 2))
        z_tiled = jnp.broadcast_to(z[:, None, :], (B, 1024, z.shape[-1])).astype(
            self.dtype
        )

        h = jnp.concatenate([z_tiled, grid.astype(self.dtype)], axis=-1)
        for layer in self.fold1:
            h = layer(h)
        fold1_out = h  # (B, 1024, 3)

        h = jnp.concatenate([z_tiled, fold1_out], axis=-1)
        for layer in self.fold2:
            h = layer(h)
        fold2_out = h  # (B, 1024, 3)

        # Dense over the *points* axis: 1024 -> num_points (networks.py:1481,1507).
        up = self.upsample(fold2_out.transpose(0, 2, 1))  # (B, 3, num_points)
        return up.transpose(0, 2, 1)  # (B, num_points, 3)


class PointNetVAE(nn.Module):
    """PointNet++ encoder + FoldingNet decoder (networks.py:1511-1725)."""

    num_points: int = 2048
    latent_dim: int = 256
    dtype: Dtype = jnp.float32

    def setup(self):
        self.encoder = PointNetPPEncoder(self.latent_dim, dtype=self.dtype)
        self.decoder = FoldingDecoder(self.latent_dim, self.num_points, dtype=self.dtype)

    def encode(self, x, train: bool = False):
        return self.encoder(x, train)

    def decode(self, z, train: bool = False):
        del train
        return self.decoder(z)

    def __call__(self, x, rng, train: bool = False):
        mu, logvar = self.encode(x, train)
        z = reparameterize(rng, mu, logvar)
        return self.decode(z), mu, logvar


class PointNetVAEExperimental(nn.Module):
    """SA x4 encoder + FeaturePropagation decoder (networks.py:1727-1982)."""

    num_points: int = 2048
    latent_dim: int = 256
    dtype: Dtype = jnp.float32

    def setup(self):
        self.sa1 = SetAbstraction(1024, 0.1, 32, mlp=[32, 32, 64], first_layer=True,
                                  dtype=self.dtype)
        self.sa2 = SetAbstraction(256, 0.2, 32, mlp=[64, 64, 128], dtype=self.dtype)
        self.sa3 = SetAbstraction(64, 0.4, 32, mlp=[128, 128, 256], dtype=self.dtype)
        self.sa4 = SetAbstraction(16, 0.8, 32, mlp=[256, 256, 512], dtype=self.dtype)
        self.fc_mu = nn.Dense(
            self.latent_dim, kernel_init=xavier_normal_gain(0.01), dtype=head_dtype(self.dtype)
        )
        self.fc_logvar = nn.Dense(
            self.latent_dim, kernel_init=xavier_normal_gain(0.01), dtype=head_dtype(self.dtype)
        )
        self.fp4 = FeaturePropagation(mlp=[256, 256], dtype=self.dtype)
        self.fp3 = FeaturePropagation(mlp=[256, 256], dtype=self.dtype)
        self.fp2 = FeaturePropagation(mlp=[256, 128], dtype=self.dtype)
        self.fp1 = FeaturePropagation(mlp=[128, 128, 3], dtype=self.dtype)
        self.out_convs = [
            nn.Dense(3, kernel_init=kaiming_out, dtype=head_dtype(self.dtype)) for _ in range(3)
        ]

    def encode(self, x, train: bool = False):
        l1_xyz, l1_points = self.sa1(x, None, train)
        l2_xyz, l2_points = self.sa2(l1_xyz, l1_points, train)
        l3_xyz, l3_points = self.sa3(l2_xyz, l2_points, train)
        l4_xyz, l4_points = self.sa4(l3_xyz, l3_points, train)
        h = jnp.mean(l4_points, axis=1)  # (B, 512) global mean pool
        return self.fc_mu(h), self.fc_logvar(h), (l1_xyz, l2_xyz, l3_xyz, l4_xyz)

    def decode(self, z, xyz_list, train: bool = False):
        l1_xyz, l2_xyz, l3_xyz, l4_xyz = xyz_list
        l3_points = self.fp4(l3_xyz, l4_xyz, None, z[:, None, :], train)
        l2_points = self.fp3(l2_xyz, l3_xyz, None, l3_points, train)
        l1_points = self.fp2(l1_xyz, l2_xyz, None, l2_points, train)
        l0_points = self.fp1(l1_xyz, l1_xyz, None, l1_points, train)
        # Upsample x2 nearest over points, then 3x 1x1 convs (networks.py:1759-1764).
        h = jnp.repeat(l0_points, 2, axis=1)
        for conv in self.out_convs:
            h = conv(h)
        return h  # (B, 2*1024, 3)

    def __call__(self, x, rng, train: bool = False):
        mu, logvar, xyz_list = self.encode(x, train)
        z = reparameterize(rng, mu, logvar)
        return self.decode(z, xyz_list, train), mu, logvar
