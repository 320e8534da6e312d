"""3D voxel VAEs on 32^3 occupancy grids.

Parity targets:
  * VAE3D      <- networks.py:1984-2206 — 4x stride-2 Conv3DBlocks down to
                  2^3, fc 512, latent 256; mirror deconv decoder + Sigmoid.
  * VAE3DLarge <- networks.py:2208-2490 — **the production VAE**
                  (train_point_ldm.py:21). Residual encoder
                  32^3 -> 16^3 -> 8^3 -> 4^3 -> k4-valid -> 512-flat; decoder
                  fc -> 512x4^3 -> 3x(ConvT + ResBlock) -> 32^3 -> Sigmoid.

Layout: channel-last (B, D, H, W, C); XLA maps 3D convs onto the MXU as
implicit GEMMs. The KL warmup/anneal weight (networks.py:2355-2370) lives in
the training task, not the module, since it is epoch-dependent host state.

Latent heads use Xavier-normal(gain=0.01) like the reference
(networks.py:2282-2283).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from shapegen_tpu.models.layers import (
    head_dtype,
    Conv3DBlock,
    Deconv3DBlock,
    ResidualBlock3D,
    kaiming_out,
    xavier_normal_gain,
)

Dtype = Any


def reparameterize(key: jax.Array, mu: jnp.ndarray, logvar: jnp.ndarray) -> jnp.ndarray:
    """z = mu + sigma * eps (networks.py:2312-2325)."""
    std = jnp.exp(0.5 * logvar)
    eps = jax.random.normal(key, std.shape, std.dtype)
    return mu + eps * std


class VAE3D(nn.Module):
    """Simple 3D conv VAE (networks.py:1984-2206)."""

    latent_dim: int = 256
    dtype: Dtype = jnp.float32

    def setup(self):
        self.enc_blocks = [
            Conv3DBlock(32, stride=2, dtype=self.dtype),
            Conv3DBlock(64, stride=2, dtype=self.dtype),
            Conv3DBlock(128, stride=2, dtype=self.dtype),
            Conv3DBlock(256, stride=2, dtype=self.dtype),
        ]
        self.enc_fc = nn.Dense(512, kernel_init=kaiming_out, dtype=self.dtype)
        self.fc_mu = nn.Dense(
            self.latent_dim, kernel_init=xavier_normal_gain(0.01), dtype=head_dtype(self.dtype)
        )
        self.fc_logvar = nn.Dense(
            self.latent_dim, kernel_init=xavier_normal_gain(0.01), dtype=head_dtype(self.dtype)
        )
        self.decoder_input = nn.Dense(
            256 * 2 * 2 * 2, kernel_init=kaiming_out, dtype=self.dtype
        )
        self.dec_blocks = [
            Deconv3DBlock(128, stride=2, dtype=self.dtype),
            Deconv3DBlock(64, stride=2, dtype=self.dtype),
            Deconv3DBlock(32, stride=2, dtype=self.dtype),
        ]
        self.dec_out = nn.ConvTranspose(
            1,
            kernel_size=(3, 3, 3),
            strides=(2, 2, 2),
            padding="SAME",
            kernel_init=kaiming_out,
            dtype=self.dtype,
        )

    def encode(self, x, train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        # x: (B, 32, 32, 32, 1)
        h = x.astype(self.dtype)
        for blk in self.enc_blocks:
            h = blk(h, train)
        h = h.reshape(h.shape[0], -1)
        h = nn.relu(self.enc_fc(h))
        return self.fc_mu(h), self.fc_logvar(h)

    def decode_logits(self, z, train: bool = False) -> jnp.ndarray:
        h = self.decoder_input(z.astype(self.dtype))
        h = h.reshape(-1, 2, 2, 2, 256)
        for blk in self.dec_blocks:
            h = blk(h, train)
        return self.dec_out(h).astype(jnp.float32)

    def decode(self, z, train: bool = False) -> jnp.ndarray:
        return nn.sigmoid(self.decode_logits(z, train))

    def forward_logits(self, x, rng, train: bool = False):
        """(logits, mu, logvar) — the loss path. BCE is computed from logits
        (optax.sigmoid_binary_cross_entropy): identical value to the
        reference's BCE(sigmoid(.)) but with bounded gradients where the
        sigmoid saturates."""
        mu, logvar = self.encode(x, train)
        z = reparameterize(rng, mu, logvar)
        return self.decode_logits(z, train), mu, logvar

    def __call__(self, x, rng, train: bool = False):
        logits, mu, logvar = self.forward_logits(x, rng, train)
        return nn.sigmoid(logits), mu, logvar


class VAE3DLarge(nn.Module):
    """The production residual 3D VAE (networks.py:2208-2490)."""

    latent_dim: int = 256
    dtype: Dtype = jnp.float32

    def setup(self):
        self.enc_in = nn.Conv(
            32, kernel_size=(3, 3, 3), padding=1, kernel_init=kaiming_out, dtype=self.dtype
        )
        self.enc_res1 = ResidualBlock3D(64, dtype=self.dtype)
        self.enc_down1 = nn.Conv(
            64, kernel_size=(4, 4, 4), strides=(2, 2, 2), padding=1,
            kernel_init=kaiming_out, dtype=self.dtype,
        )
        self.enc_res2 = ResidualBlock3D(128, dtype=self.dtype)
        self.enc_down2 = nn.Conv(
            128, kernel_size=(4, 4, 4), strides=(2, 2, 2), padding=1,
            kernel_init=kaiming_out, dtype=self.dtype,
        )
        self.enc_res3 = ResidualBlock3D(256, dtype=self.dtype)
        self.enc_down3 = nn.Conv(
            256, kernel_size=(4, 4, 4), strides=(2, 2, 2), padding=1,
            kernel_init=kaiming_out, dtype=self.dtype,
        )
        self.enc_res4 = ResidualBlock3D(512, dtype=self.dtype)
        self.enc_final = nn.Conv(
            512, kernel_size=(4, 4, 4), padding="VALID",
            kernel_init=kaiming_out, dtype=self.dtype,
        )
        self.fc_mu = nn.Dense(
            self.latent_dim, kernel_init=xavier_normal_gain(0.01), dtype=head_dtype(self.dtype)
        )
        self.fc_logvar = nn.Dense(
            self.latent_dim, kernel_init=xavier_normal_gain(0.01), dtype=head_dtype(self.dtype)
        )

        self.decoder_input = nn.Dense(
            512 * 4 * 4 * 4, kernel_init=kaiming_out, dtype=self.dtype
        )
        self.dec_up1 = nn.ConvTranspose(
            256, kernel_size=(4, 4, 4), strides=(2, 2, 2), padding="SAME",
            kernel_init=kaiming_out, dtype=self.dtype,
        )
        self.dec_res1 = ResidualBlock3D(256, dtype=self.dtype)
        self.dec_up2 = nn.ConvTranspose(
            128, kernel_size=(4, 4, 4), strides=(2, 2, 2), padding="SAME",
            kernel_init=kaiming_out, dtype=self.dtype,
        )
        self.dec_res2 = ResidualBlock3D(128, dtype=self.dtype)
        self.dec_up3 = nn.ConvTranspose(
            64, kernel_size=(4, 4, 4), strides=(2, 2, 2), padding="SAME",
            kernel_init=kaiming_out, dtype=self.dtype,
        )
        self.dec_res3 = ResidualBlock3D(64, dtype=self.dtype)
        self.dec_conv = nn.Conv(
            32, kernel_size=(3, 3, 3), padding=1, kernel_init=kaiming_out, dtype=self.dtype
        )
        self.dec_res4 = ResidualBlock3D(32, dtype=self.dtype)
        self.dec_out = nn.Conv(
            1, kernel_size=(3, 3, 3), padding=1, kernel_init=kaiming_out, dtype=self.dtype
        )

    def encode(self, x, train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        # x: (B, 32, 32, 32, 1) occupancy in [0, 1].
        h = nn.relu(self.enc_in(x.astype(self.dtype)))  # (B,32^3,32)
        h = self.enc_res1(h, train)                      # 64
        h = nn.relu(self.enc_down1(h))                   # 16^3
        h = self.enc_res2(h, train)                      # 128
        h = nn.relu(self.enc_down2(h))                   # 8^3
        h = self.enc_res3(h, train)                      # 256
        h = nn.relu(self.enc_down3(h))                   # 4^3
        h = self.enc_res4(h, train)                      # 512
        h = nn.relu(self.enc_final(h))                   # 1^3 x 512
        h = h.reshape(h.shape[0], -1)
        return self.fc_mu(h), self.fc_logvar(h)

    def decode_logits(self, z, train: bool = False) -> jnp.ndarray:
        h = self.decoder_input(z.astype(self.dtype))
        h = h.reshape(-1, 4, 4, 4, 512)
        h = nn.relu(self.dec_up1(h))   # 8^3 x 256
        h = self.dec_res1(h, train)
        h = nn.relu(self.dec_up2(h))   # 16^3 x 128
        h = self.dec_res2(h, train)
        h = nn.relu(self.dec_up3(h))   # 32^3 x 64
        h = self.dec_res3(h, train)
        h = nn.relu(self.dec_conv(h))  # 32
        h = self.dec_res4(h, train)
        return self.dec_out(h).astype(jnp.float32)

    def decode(self, z, train: bool = False) -> jnp.ndarray:
        return nn.sigmoid(self.decode_logits(z, train))

    def forward_logits(self, x, rng, train: bool = False):
        """(logits, mu, logvar) — see VAE3D.forward_logits."""
        mu, logvar = self.encode(x, train)
        z = reparameterize(rng, mu, logvar)
        return self.decode_logits(z, train), mu, logvar

    def __call__(self, x, rng, train: bool = False):
        logits, mu, logvar = self.forward_logits(x, rng, train)
        return nn.sigmoid(logits), mu, logvar


def kl_divergence_sum(mu: jnp.ndarray, logvar: jnp.ndarray) -> jnp.ndarray:
    """-0.5 * sum(1 + logvar - mu^2 - exp(logvar)) (networks.py:2120)."""
    return -0.5 * jnp.sum(1.0 + logvar - mu**2 - jnp.exp(logvar))


def kl_divergence_mean(mu: jnp.ndarray, logvar: jnp.ndarray) -> jnp.ndarray:
    """Mean-reduced KL (networks.py:2390, VAE3DLarge)."""
    return -0.5 * jnp.mean(1.0 + logvar - mu**2 - jnp.exp(logvar))


def binary_cross_entropy(
    pred: jnp.ndarray, target: jnp.ndarray, reduction: str = "mean"
) -> jnp.ndarray:
    """torch F.binary_cross_entropy parity, incl. the log clamp at -100."""
    log_p = jnp.maximum(jnp.log(pred), -100.0)
    log_1p = jnp.maximum(jnp.log(1.0 - pred), -100.0)
    bce = -(target * log_p + (1.0 - target) * log_1p)
    if reduction == "mean":
        return jnp.mean(bce)
    if reduction == "sum":
        return jnp.sum(bce)
    return bce


def kl_warmup_weight(
    epoch: jnp.ndarray,
    max_epochs: int,
    kl_warmup_epochs: int = 10,
    kl_warmup_max_beta: float = 0.1,
    kl_annealing_epochs: int = 100,
) -> jnp.ndarray:
    """VAE3DLarge's piecewise KL weight (networks.py:2355-2370).

    Linear 0 -> max_beta over the first 10 epochs (the reference hardcodes
    `current_epoch < 10` rather than kl_warmup_epochs — preserved), then
    anneal max_beta -> 1.0 by kl_annealing_epochs. Validation uses weight 1.0
    (networks.py:2393).
    """
    annealing_epochs = min(max_epochs, kl_annealing_epochs)
    e = jnp.asarray(epoch, jnp.float32)
    warm = (e + 1.0) / kl_warmup_epochs * kl_warmup_max_beta
    anneal = jnp.minimum(
        kl_warmup_max_beta
        + (e - kl_warmup_epochs + 1.0)
        / (annealing_epochs - kl_warmup_epochs)
        * (1.0 - kl_warmup_max_beta),
        1.0,
    )
    return jnp.where(e < 10, warm, anneal)
