"""MLP U-Net denoiser over VAE latents (the LDM epsilon-predictor).

Parity target: SimpleLatentUNetPointNet (networks.py:962-1106), used by
LatentDiffusion at diffusion.py:380 with (latent_dim=256, dim=512,
time_dim=256). Encoder dim/4 -> dim/2 -> dim -> 2*dim, global feature 8*dim,
decoder with Dense "refine" skips, dropout 0.1 only in dec1, plain MLP output
head back to latent_dim. All rungs are Dense + GroupNorm(8) + ReLU.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from shapegen_tpu.models.layers import (
    DenseGN,
    head_dtype,
    kaiming_out,
    timestep_embedding,
)

Dtype = Any

# Tensor-parallel sharding rules for SimpleLatentUNet on an N-D mesh with a
# 'model' axis (parallel.mesh.tree_shardings consumes these; the 1-D data
# mesh stays the perf default). Megatron-style column->row split of the
# widest pair, the global-feature chain:
#   * DenseGN_4 (2*dim -> 4*dim) column-parallel: kernel out-dim, bias and
#     the GroupNorm scale/bias shard per-channel. GroupNorm(8) statistics
#     stay LOCAL to each model shard because group boundaries align with
#     shard boundaries whenever the model-axis size divides the group count
#     (8) — see LATENT_UNET_TP_MAX_MODEL below;
#   * DenseGN_5 (4*dim -> 8*dim) row-parallel: the kernel's contracting dim
#     matches the sharded activation, XLA inserts ONE psum over the
#     (B, 8*dim) partial sums, after which bias/GroupNorm run replicated.
# Anchored on the tree containers a TOP-LEVEL module sits directly under
# (params / optax moments mu & nu); GroupNorm keeps no batch stats.
_TP_ROOT = r"(?:^|/)(?:params|mu|nu)/"
SIMPLE_LATENT_UNET_TP_RULES = [
    (_TP_ROOT + r"DenseGN_4/Dense_0/kernel$",
     jax.sharding.PartitionSpec(None, "model")),
    (_TP_ROOT + r"DenseGN_4/(Dense_0/bias|GroupNorm_0/(bias|scale))$",
     jax.sharding.PartitionSpec("model")),
    (_TP_ROOT + r"DenseGN_5/Dense_0/kernel$",
     jax.sharding.PartitionSpec("model", None)),
]

#: The model axis must divide DenseGN's GroupNorm group count so each shard
#: holds whole groups (group statistics then need no cross-shard comms).
LATENT_UNET_TP_MAX_MODEL = 8


class SimpleLatentUNet(nn.Module):
    latent_dim: int = 256
    dim: int = 512
    time_dim: int = 256
    dropout_rate: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z, t, train: bool = False):
        # z: (B, latent_dim), t: (B,). Returns (B, latent_dim).
        d = self.dim
        t_emb = timestep_embedding(t, self.time_dim)
        t_emb = nn.Dense(self.time_dim, kernel_init=kaiming_out, dtype=self.dtype)(t_emb)
        t_emb = nn.silu(t_emb)
        t_emb = nn.Dense(self.time_dim, kernel_init=kaiming_out, dtype=self.dtype)(t_emb)

        h = jnp.concatenate([z.astype(self.dtype), t_emb], axis=-1)

        z1 = DenseGN(d // 4, dtype=self.dtype)(h)
        z2 = DenseGN(d // 2, dtype=self.dtype)(z1)
        z3 = DenseGN(d, dtype=self.dtype)(z2)
        z4 = DenseGN(d * 2, dtype=self.dtype)(z3)

        g = DenseGN(d * 4, dtype=self.dtype)(z4)
        g = DenseGN(d * 8, dtype=self.dtype)(g)

        r1 = nn.Dense(d // 4, kernel_init=kaiming_out, dtype=self.dtype)(z1)
        r2 = nn.Dense(d // 2, kernel_init=kaiming_out, dtype=self.dtype)(z2)
        r3 = nn.Dense(d, kernel_init=kaiming_out, dtype=self.dtype)(z3)
        r4 = nn.Dense(d * 2, kernel_init=kaiming_out, dtype=self.dtype)(z4)

        h = DenseGN(d * 2, dtype=self.dtype)(jnp.concatenate([g, r4], axis=-1))
        h = DenseGN(d, dtype=self.dtype)(jnp.concatenate([h, r3], axis=-1))
        h = DenseGN(d // 2, dtype=self.dtype)(jnp.concatenate([h, r2], axis=-1))
        h = DenseGN(d // 4, dtype=self.dtype)(jnp.concatenate([h, r1], axis=-1))
        h = nn.Dropout(self.dropout_rate, deterministic=not train)(h)

        h = nn.Dense(d // 4, kernel_init=kaiming_out, dtype=self.dtype)(h)
        h = nn.relu(h)
        return nn.Dense(self.latent_dim, kernel_init=kaiming_out, dtype=head_dtype(self.dtype))(h)
