"""Reusable network blocks (flax.linen, channel-last layouts).

The reference works in torch's channel-first (B, C, N) with Conv1d(k=1)
"shared MLPs" (networks.py:16-49). A kernel-size-1 Conv1d is exactly a Dense
layer over the channel axis, so here everything is channel-last (B, N, C) and
the shared MLPs are ``nn.Dense`` — each becomes one large (B*N, C) x (C, C')
matmul that tiles directly onto the MXU, with BatchNorm/ReLU fused around it
by XLA.

Parity notes:
  * BatchNorm: torch BatchNorm1d over (B, C, N) normalizes each channel over
    (B, N); flax ``nn.BatchNorm`` on (B, N, C) reduces over all non-feature
    axes — identical. momentum: torch's 0.1 "new fraction" == flax's 0.9
    decay. eps 1e-5 both. (Torch tracks the *unbiased* variance in running
    stats while normalizing with the biased one; flax uses biased for both —
    documented drift, negligible at these batch sizes.)
  * Weight init: Kaiming-normal fan_out (diffusion.py:40-54,
    networks.py:1158-1173) == variance_scaling(2.0, 'fan_out', 'normal');
    biases zero; the VAE heads use Xavier-normal with gain 0.01.
  * Blocks covered (reference lines): PointNetLayer 16-49,
    SetAttentionBlock 51-83, CrossAttentionBlock 85-136,
    PointNetLayerWithAttention 138-180, FoldingLayer 386-412,
    Conv3DBlock/Deconv3DBlock 415-468, ResidualBlock3D 471-504, and the
    sinusoidal timestep embedding duplicated at networks.py:820-838 etc.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

# Kaiming-normal, fan_out, relu (torch nn.init.kaiming_normal_ mode='fan_out').
kaiming_out = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


def head_dtype(dtype: Dtype) -> jnp.dtype:
    """Compute dtype for output heads: at least f32. Under bf16 mixed
    precision the head stays f32 (loss-side stability); under f64 (the torch
    lockstep parity tests) it promotes to f64 so no f32 truncation seam
    seeds chaotic Adam divergence over multi-step trajectories."""
    return jnp.promote_types(jnp.float32, jnp.dtype(dtype))


def xavier_normal_gain(gain: float):
    """torch nn.init.xavier_normal_(w, gain) for Dense kernels."""

    def init(key, shape, dtype=jnp.float32):
        fan_in, fan_out = shape[0], shape[1]
        std = gain * math.sqrt(2.0 / (fan_in + fan_out))
        return std * jax.random.normal(key, shape, dtype)

    return init


def timestep_embedding(timesteps: jnp.ndarray, embedding_dim: int) -> jnp.ndarray:
    """Sinusoidal embedding of continuous t (networks.py:820-838).

    emb = exp(-arange(half) * ln(10000)/(half-1)); concat(sin, cos); zero-pad
    odd dims.
    """
    half_dim = embedding_dim // 2
    scale = math.log(10000.0) / (half_dim - 1)
    freqs = jnp.exp(jnp.arange(half_dim, dtype=jnp.float32) * -scale)
    # f32 frequency table (bitwise the reference's), but let the timestep
    # dtype promote — torch computes f32-freqs x f64-t in f64, and the f64
    # lockstep parity tests need the same here. Promotion floors at f32 so a
    # bf16 timestep can never drag the sin/cos table below f32 and silently
    # degrade the time conditioning.
    args_dtype = jnp.promote_types(timesteps.dtype, jnp.float32)
    args = timesteps.astype(args_dtype)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
    if embedding_dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class DenseBN(nn.Module):
    """Dense -> BatchNorm -> (optional ReLU): one Conv1d(k1)+BN1d+ReLU rung."""

    features: int
    use_relu: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dense(self.features, kernel_init=kaiming_out, dtype=self.dtype)(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
        )(x)
        if self.use_relu:
            x = nn.relu(x)
        return x


class PointNetLayer(nn.Module):
    """3x (Dense -> BN -> ReLU) shared point MLP (networks.py:16-49)."""

    mid_dim: int
    out_dim: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        out_dim = self.out_dim if self.out_dim is not None else self.mid_dim
        x = DenseBN(self.mid_dim, dtype=self.dtype)(x, train)
        x = DenseBN(self.mid_dim, dtype=self.dtype)(x, train)
        x = DenseBN(out_dim, dtype=self.dtype)(x, train)
        return x


class SetAttentionBlock(nn.Module):
    """Pre-LN self-attention + 4x FF with residuals (networks.py:51-83).

    Input/output (B, N, C); no (N, B, C) transposes needed — flax attention is
    batch-first and the whole block is one fused XLA region.
    """

    dim: int
    num_heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        ln1 = nn.LayerNorm(dtype=self.dtype)(x)
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=self.dim, dtype=self.dtype
        )(ln1, ln1)
        x = x + attn
        ln2 = nn.LayerNorm(dtype=self.dtype)(x)
        ff = nn.Dense(self.dim * 4, dtype=self.dtype)(ln2)
        ff = nn.relu(ff)
        ff = nn.Dense(self.dim, dtype=self.dtype)(ff)
        return x + ff


class CrossAttentionBlock(nn.Module):
    """x attends to projected y (networks.py:85-136). Channel-last (B, N, C)."""

    dim_x: int
    dim_y: int
    num_heads: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, y):
        xn = nn.LayerNorm(dtype=self.dtype)(x)
        yn = nn.LayerNorm(dtype=self.dtype)(y)
        yp = nn.Dense(self.dim_x, dtype=self.dtype)(yn)
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=self.dim_x, dtype=self.dtype
        )(xn, yp)
        x = xn + attn
        ln = nn.LayerNorm(dtype=self.dtype)(x)
        ff = nn.Dense(self.dim_x * 4, dtype=self.dtype)(ln)
        ff = nn.relu(ff)
        ff = nn.Dense(self.dim_x, dtype=self.dtype)(ff)
        return x + ff


class PointNetLayerWithAttention(nn.Module):
    """PointNetLayer + residual 4-head self-attention (networks.py:138-180)."""

    mid_dim: int
    out_dim: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        out_dim = self.out_dim if self.out_dim is not None else self.mid_dim
        x = DenseBN(self.mid_dim, dtype=self.dtype)(x, train)
        x = DenseBN(self.mid_dim, dtype=self.dtype)(x, train)
        x = DenseBN(out_dim, use_relu=False, dtype=self.dtype)(x, train)
        ln = nn.LayerNorm(dtype=self.dtype)(x)
        attn = nn.MultiHeadDotProductAttention(
            num_heads=4, qkv_features=out_dim, dtype=self.dtype
        )(ln, ln)
        return nn.relu(x + attn)


class FoldingLayer(nn.Module):
    """Dense -> ReLU -> Dense over points (networks.py:386-412)."""

    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.out_channels, kernel_init=kaiming_out, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Dense(self.out_channels, kernel_init=kaiming_out, dtype=self.dtype)(x)
        return x


class Conv3DBlock(nn.Module):
    """Conv3d(k3) + BN + ReLU (networks.py:415-440). Layout (B, D, H, W, C)."""

    features: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features,
            kernel_size=(3, 3, 3),
            strides=(self.stride,) * 3,
            padding=1,
            kernel_init=kaiming_out,
            dtype=self.dtype,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype
        )(x)
        return nn.relu(x)


class Deconv3DBlock(nn.Module):
    """ConvTranspose3d(k3) + BN + ReLU (networks.py:442-468).

    With stride 2 the torch config (p=1, output_padding=1) doubles each
    spatial dim; flax ConvTranspose with padding='SAME' does the same.
    """

    features: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.ConvTranspose(
            self.features,
            kernel_size=(3, 3, 3),
            strides=(self.stride,) * 3,
            padding="SAME",
            kernel_init=kaiming_out,
            dtype=self.dtype,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype
        )(x)
        return nn.relu(x)


class ResidualBlock3D(nn.Module):
    """2x Conv3d+BN with 1x1 shortcut when channels change (networks.py:471-504)."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        out = nn.Conv(
            self.features,
            kernel_size=(3, 3, 3),
            padding=1,
            kernel_init=kaiming_out,
            dtype=self.dtype,
        )(x)
        out = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype
        )(out)
        out = nn.relu(out)
        out = nn.Conv(
            self.features,
            kernel_size=(3, 3, 3),
            padding=1,
            kernel_init=kaiming_out,
            dtype=self.dtype,
        )(out)
        out = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype
        )(out)
        if x.shape[-1] != self.features:
            residual = nn.Conv(
                self.features,
                kernel_size=(1, 1, 1),
                kernel_init=kaiming_out,
                dtype=self.dtype,
            )(x)
        return nn.relu(out + residual)


class DenseGN(nn.Module):
    """Dense -> GroupNorm(8) -> ReLU rung of the latent U-Net (networks.py:984-1036)."""

    features: int
    groups: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.features, kernel_init=kaiming_out, dtype=self.dtype)(x)
        x = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5, dtype=self.dtype)(x)
        return nn.relu(x)


class MLP(nn.Module):
    """Plain Dense stack with ReLU between (no norm)."""

    features: Sequence[int]
    final_relu: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i, f in enumerate(self.features):
            x = nn.Dense(f, kernel_init=kaiming_out, dtype=self.dtype)(x)
            if i < len(self.features) - 1 or self.final_relu:
                x = nn.relu(x)
        return x
