"""Point-cloud denoiser U-Nets (the DDPM epsilon-predictors).

Parity targets:
  * PointUNetLarge            <- UNetPointNetLarge (networks.py:724-838), the
                                 production point-DDPM denoiser
                                 (instantiated dim=256, time_dim=256 at
                                 diffusion.py:15,28 — `dim` only sizes the
                                 time MLP and must equal time_dim for the
                                 input concat, as in the reference).
  * SimplePointUNet           <- SimpleUNetPointNet (networks.py:508-595).
  * UNetAttentionPoint        <- UNetAttentionPointExperimental
                                 (networks.py:597-722, unused by entry points).
  * PointUNetLargeWithAttention <- UNetPointNetLargeWithAttentionExperimental
                                 (networks.py:840-960, unused by entry points).

Layout: channel-last (B, N, C); every shared point-MLP rung is one (B*N, C)
matmul on the MXU. The per-cloud global feature is a max over N; its
broadcast back over points is a free XLA broadcast (the reference used a
materializing .repeat, networks.py:808).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from shapegen_tpu.models.layers import (
    DenseBN,
    PointNetLayer,
    PointNetLayerWithAttention,
    CrossAttentionBlock,
    SetAttentionBlock,
    head_dtype,
    kaiming_out,
    timestep_embedding,
)

Dtype = Any

# Tensor-parallel sharding rules for PointUNetLarge on an N-D mesh with a
# 'model' axis (parallel.mesh.tree_shardings consumes these; the 1-D data
# mesh stays the perf default — see docs/ARCHITECTURE.md). Megatron-style
# column->row split of the widest pair, the global-feature chain:
#   * DenseBN_0 (1024 -> 2048) column-parallel: kernel out-dim, bias and the
#     BatchNorm scale/bias/mean/var all shard per-channel — BN batch stats
#     are per-channel reductions over (B, N), so they stay LOCAL to each
#     model shard (no cross-axis comms through the norm);
#   * DenseBN_1 (2048 -> 4096) row-parallel: the kernel's contracting dim
#     matches the sharded activation, XLA inserts ONE psum over the (B, N,
#     4096) partial sums, after which bias/BN/max-pool run replicated.
# The rules must hit only the TOP-LEVEL DenseBN_0/DenseBN_1 (PointNetLayer
# submodules contain same-named children), so they anchor on the tree
# containers a top-level module sits directly under: params / batch_stats /
# the optax moment trees mu & nu.
_TP_ROOT = r"(?:^|/)(?:params|batch_stats|mu|nu)/"
POINT_UNET_LARGE_TP_RULES = [
    (_TP_ROOT + r"DenseBN_0/Dense_0/kernel$",
     jax.sharding.PartitionSpec(None, "model")),
    (_TP_ROOT + r"DenseBN_0/(Dense_0/bias|BatchNorm_0/"
     r"(bias|scale|mean|var))$",
     jax.sharding.PartitionSpec("model")),
    (_TP_ROOT + r"DenseBN_1/Dense_0/kernel$",
     jax.sharding.PartitionSpec("model", None)),
]


class TimeMLP(nn.Module):
    """Linear -> SiLU -> Linear over the sinusoidal embedding (networks.py:737-741).

    With ``num_classes`` set, a learned class embedding is added to the
    sinusoidal embedding first (category-conditioning extension; index
    ``num_classes`` is the classifier-free-guidance null token).
    """

    dim: int
    time_dim: int
    num_classes: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, t, y=None):
        emb = timestep_embedding(t, self.time_dim)
        if self.num_classes is not None:
            if y is None:
                y = jnp.full((t.shape[0],), self.num_classes, jnp.int32)
            emb = emb + nn.Embed(
                self.num_classes + 1, self.time_dim, dtype=self.dtype
            )(y.astype(jnp.int32))
        emb = nn.Dense(self.dim, kernel_init=kaiming_out, dtype=self.dtype)(emb)
        emb = nn.silu(emb)
        emb = nn.Dense(self.dim, kernel_init=kaiming_out, dtype=self.dtype)(emb)
        return emb


class PointUNetLarge(nn.Module):
    """The production point-DDPM denoiser (networks.py:724-838). 21.5M params
    at the entry-point config (dim=256, time_dim=256; see BASELINE.md)."""

    dim: int = 256
    time_dim: int = 256
    num_classes: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, t, y=None, train: bool = False):
        # x: (B, N, 3), t: (B,) in [0, 1], y: optional (B,) int category ids.
        # Conditioning is an extension over the reference (which trains one
        # unconditional model per category): a learned class embedding is
        # added to the sinusoidal time embedding; index `num_classes` is the
        # classifier-free-guidance null token. num_classes=None == parity.
        B, N, _ = x.shape
        t_emb = TimeMLP(
            self.dim, self.time_dim, num_classes=self.num_classes,
            dtype=self.dtype,
        )(t, y)
        t_tiled = jnp.broadcast_to(t_emb[:, None, :], (B, N, t_emb.shape[-1]))
        h = jnp.concatenate([x.astype(self.dtype), t_tiled], axis=-1)

        def inject(d, name):
            # Conditional-only per-stage conditioning (extension): the
            # input-concat pathway alone washes out through the encoder/max
            # -pool, leaving class conditioning too weak to steer sampling;
            # an additive projection of the (time+class) embedding into each
            # decoder stage keeps it live. Explicitly named so the
            # UNCONDITIONAL parameter tree is byte-identical to before
            # (checkpoint compatibility, tests/test_param_structure.py).
            if self.num_classes is None:
                return d
            e = nn.Dense(
                d.shape[-1], name=name, kernel_init=kaiming_out,
                dtype=self.dtype,
            )(t_emb)
            return d + e[:, None, :]

        x1 = PointNetLayer(64, 128, dtype=self.dtype)(h, train)
        x2 = PointNetLayer(128, 256, dtype=self.dtype)(x1, train)
        x3 = PointNetLayer(256, 512, dtype=self.dtype)(x2, train)
        x4 = PointNetLayer(512, 1024, dtype=self.dtype)(x3, train)

        g = DenseBN(2048, dtype=self.dtype)(x4, train)
        g = DenseBN(4096, dtype=self.dtype)(g, train)
        g = jnp.max(g, axis=1, keepdims=True)  # (B, 1, 4096)
        if self.num_classes is not None:
            # Conditional-only global-pathway injection (extension): the
            # decoder is driven mostly by this pooled global feature, which
            # the per-stage additive injections cannot reach (the max-pool
            # sits upstream of them); projecting the (time+class) embedding
            # into it steers the dominant pathway directly and makes the
            # learned conditioning strength robust across training runs.
            # Named so the UNCONDITIONAL tree stays byte-identical.
            g = g + nn.Dense(
                g.shape[-1], name="cond_global", kernel_init=kaiming_out,
                dtype=self.dtype,
            )(t_emb)[:, None, :]

        r4 = nn.Dense(1024, kernel_init=kaiming_out, dtype=self.dtype)(x4)
        r3 = nn.Dense(512, kernel_init=kaiming_out, dtype=self.dtype)(x3)
        r2 = nn.Dense(256, kernel_init=kaiming_out, dtype=self.dtype)(x2)
        r1 = nn.Dense(128, kernel_init=kaiming_out, dtype=self.dtype)(x1)

        # dec4's first rung is Dense(concat([g_broadcast, r4])). Since the
        # global feature is identical for every point, split the kernel:
        # Dense[W_g; W_r](concat) == Dense_g(g) + Dense_r(r4). The g branch
        # runs once per cloud ((B,1,4096) -> (B,1,1024)) and broadcast-adds —
        # identical math (the reference materializes a (B,N,4096) repeat,
        # networks.py:808,811), but ~40% fewer dec4 FLOPs and no (B,N,4096)
        # tensor in HBM/VMEM.
        g_proj = nn.Dense(
            1024, use_bias=False, kernel_init=kaiming_out, dtype=self.dtype
        )(g)
        d = nn.Dense(1024, kernel_init=kaiming_out, dtype=self.dtype)(r4) + g_proj
        d = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype,
        )(d)
        d = nn.relu(d)
        d = inject(d, "cond_dec4")
        d = DenseBN(1024, dtype=self.dtype)(d, train)
        d = DenseBN(512, dtype=self.dtype)(d, train)

        d = PointNetLayer(512, 256, dtype=self.dtype)(
            jnp.concatenate([inject(d, "cond_dec3"), r3], axis=-1), train
        )
        d = PointNetLayer(256, 128, dtype=self.dtype)(
            jnp.concatenate([inject(d, "cond_dec2"), r2], axis=-1), train
        )
        d = PointNetLayer(128, 64, dtype=self.dtype)(
            jnp.concatenate([inject(d, "cond_dec1"), r1], axis=-1), train
        )

        out = DenseBN(64, dtype=self.dtype)(d, train)
        out = nn.Dense(3, kernel_init=kaiming_out, dtype=head_dtype(self.dtype))(out)
        return out


class SimplePointUNet(nn.Module):
    """3-stage point U-Net with raw time-embed concat (networks.py:508-595)."""

    dim: int = 256
    time_dim: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, t, train: bool = False):
        B, N, _ = x.shape
        # Raw sinusoidal embedding, no time MLP (networks.py:553-558).
        t_emb = timestep_embedding(t, self.time_dim)
        t_tiled = jnp.broadcast_to(t_emb[:, None, :], (B, N, self.time_dim))
        h = jnp.concatenate([x.astype(self.dtype), t_tiled], axis=-1)

        x1 = PointNetLayer(64, dtype=self.dtype)(h, train)
        x2 = PointNetLayer(128, dtype=self.dtype)(x1, train)
        x3 = PointNetLayer(256, dtype=self.dtype)(x2, train)

        g = DenseBN(1024, dtype=self.dtype)(x3, train)
        g = jnp.max(g, axis=1, keepdims=True)  # (B, 1, 1024)

        # Split-kernel global injection (see PointUNetLarge): the g branch of
        # dec3's first rung runs once per cloud and broadcast-adds.
        g_proj = nn.Dense(
            256, use_bias=False, kernel_init=kaiming_out, dtype=self.dtype
        )(g)
        d = nn.Dense(256, kernel_init=kaiming_out, dtype=self.dtype)(x3) + g_proj
        d = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype,
        )(d)
        d = nn.relu(d)
        d = DenseBN(256, dtype=self.dtype)(d, train)
        d = DenseBN(256, dtype=self.dtype)(d, train)
        d = PointNetLayer(128, dtype=self.dtype)(
            jnp.concatenate([d, x2], axis=-1), train
        )
        d = PointNetLayer(64, dtype=self.dtype)(
            jnp.concatenate([d, x1], axis=-1), train
        )
        return nn.Dense(3, kernel_init=kaiming_out, dtype=head_dtype(self.dtype))(d)


class UNetAttentionPoint(nn.Module):
    """Per-stage time injection + set attention (networks.py:597-722; experimental)."""

    dim: int = 256
    num_heads: int = 4
    time_dim: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, t, train: bool = False):
        t_emb = timestep_embedding(t, self.time_dim)
        t_emb = nn.Dense(self.dim, dtype=self.dtype)(t_emb)
        t_emb = nn.silu(t_emb)
        t_emb = nn.Dense(self.dim, dtype=self.dtype)(t_emb)

        def inject(h, width):
            e = nn.Dense(width, kernel_init=kaiming_out, dtype=self.dtype)(t_emb)
            return h + e[:, None, :]

        h = inject(x.astype(self.dtype), 3)
        x1 = PointNetLayer(64, dtype=self.dtype)(h, train)
        x1 = SetAttentionBlock(64, self.num_heads, dtype=self.dtype)(x1)

        x1 = inject(x1, 64)
        x2 = PointNetLayer(128, dtype=self.dtype)(x1, train)
        x2 = SetAttentionBlock(128, self.num_heads, dtype=self.dtype)(x2)

        x2 = inject(x2, 128)
        x3 = PointNetLayer(256, dtype=self.dtype)(x2, train)
        x3 = SetAttentionBlock(256, self.num_heads, dtype=self.dtype)(x3)

        xb = SetAttentionBlock(256, self.num_heads, dtype=self.dtype)(x3)

        xb = inject(xb, 256)
        xb = SetAttentionBlock(256, self.num_heads, dtype=self.dtype)(xb)
        d = PointNetLayer(128, dtype=self.dtype)(
            jnp.concatenate([xb, x3], axis=-1), train
        )

        d = inject(d, 128)
        d = SetAttentionBlock(128, self.num_heads, dtype=self.dtype)(d)
        d = PointNetLayer(64, dtype=self.dtype)(
            jnp.concatenate([d, x2], axis=-1), train
        )

        d = inject(d, 64)
        d = SetAttentionBlock(64, self.num_heads, dtype=self.dtype)(d)
        d = PointNetLayer(3, dtype=self.dtype)(
            jnp.concatenate([d, x1], axis=-1), train
        )
        return nn.Dense(3, kernel_init=kaiming_out, dtype=head_dtype(self.dtype))(d)


class PointUNetLargeWithAttention(nn.Module):
    """Large U-Net + cross-attention skips (networks.py:840-960; experimental)."""

    dim: int = 256
    time_dim: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, t, train: bool = False):
        B, N, _ = x.shape
        t_emb = TimeMLP(self.dim, self.time_dim, dtype=self.dtype)(t)
        t_tiled = jnp.broadcast_to(t_emb[:, None, :], (B, N, t_emb.shape[-1]))
        h = jnp.concatenate([x.astype(self.dtype), t_tiled], axis=-1)

        x1 = PointNetLayerWithAttention(64, 128, dtype=self.dtype)(h, train)
        x2 = PointNetLayerWithAttention(128, 256, dtype=self.dtype)(x1, train)
        x3 = PointNetLayerWithAttention(256, 512, dtype=self.dtype)(x2, train)
        x4 = PointNetLayerWithAttention(512, 1024, dtype=self.dtype)(x3, train)

        g = DenseBN(2048, dtype=self.dtype)(x4, train)
        g = DenseBN(4096, dtype=self.dtype)(g, train)

        d = PointNetLayerWithAttention(1024, 512, dtype=self.dtype)(g, train)
        d = CrossAttentionBlock(512, 1024, dtype=self.dtype)(d, x4)
        d = PointNetLayerWithAttention(512, 256, dtype=self.dtype)(d, train)
        d = CrossAttentionBlock(256, 512, dtype=self.dtype)(d, x3)
        d = PointNetLayerWithAttention(256, 128, dtype=self.dtype)(d, train)
        d = CrossAttentionBlock(128, 256, dtype=self.dtype)(d, x2)
        d = PointNetLayerWithAttention(128, 64, dtype=self.dtype)(d, train)
        d = CrossAttentionBlock(64, 128, dtype=self.dtype)(d, x1)

        out = DenseBN(64, dtype=self.dtype)(d, train)
        return nn.Dense(3, kernel_init=kaiming_out, dtype=head_dtype(self.dtype))(out)
