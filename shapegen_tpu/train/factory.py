"""Rebuild tasks/models from checkpoint hparams.

Lightning's ``load_from_checkpoint`` rebuilds a module argument-free from the
hyperparameters stored in the .ckpt (test_point_ddpm.py:161); this module is
the equivalent: checkpoint metadata carries the task hparams, and
``load_task_checkpoint`` reconstructs (task, state).

LatentDiffusion's external-VAE injection pattern (diffusion.py:375
``save_hyperparameters(ignore=['vae'])``; train_point_ldm.py:222
``load_from_checkpoint(..., vae=vae)``) is mirrored: latent-diffusion
checkpoints do NOT contain the VAE; pass it in.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from shapegen_tpu import models
from shapegen_tpu.train import tasks
from shapegen_tpu.train.checkpoints import load_checkpoint, load_checkpoint_meta
from shapegen_tpu.train.state import TrainState


def task_from_hparams(
    hparams: Dict[str, Any],
    vae_model=None,
    vae_variables=None,
    max_epochs: int = 500,
):
    kind = hparams["task"]
    # Every task records its model's compute dtype in hparams so a resumed
    # run (or --skip-vae-training + --vae-checkpoint) keeps the bf16/f32
    # choice it was trained with instead of silently reverting to f32.
    cdtype = jnp.dtype(hparams.get("compute_dtype", "float32"))
    if kind == "point_diffusion":
        num_classes = hparams.get("num_classes")
        model = models.PointUNetLarge(
            dim=hparams.get("dim", 256),
            time_dim=hparams.get("time_dim", 256),
            num_classes=num_classes,
            dtype=cdtype,
        )
        return tasks.PointDiffusionTask(
            model,
            num_points=hparams.get("num_points", 2048),
            lr=hparams.get("lr", 1e-4),
            noise_schedule=hparams.get("noise_schedule", "cosine"),
            num_classes=num_classes,
            lr_schedule=hparams.get("lr_schedule", "plateau"),
        )
    if kind == "latent_diffusion":
        if vae_model is None or vae_variables is None:
            raise ValueError(
                "latent_diffusion checkpoints do not store the VAE "
                "(diffusion.py:375 parity); pass vae_model + vae_variables"
            )
        model = models.SimpleLatentUNet(
            latent_dim=hparams.get("latent_dim", 256),
            dim=hparams.get("dim", 512),
            time_dim=hparams.get("time_dim", 256),
            dtype=cdtype,
        )
        return tasks.LatentDiffusionTask(
            model, vae_model, vae_variables,
            latent_dim=hparams.get("latent_dim", 256),
            lr=hparams.get("lr", 1e-4),
            noise_schedule=hparams.get("noise_schedule", "cosine"),
            is_voxel_based=hparams.get("is_voxel_based", True),
            max_epochs=max_epochs,
        )
    if kind == "vae3d_large":
        model = models.VAE3DLarge(
            latent_dim=hparams.get("latent_dim", 256), dtype=cdtype
        )
        return tasks.VAE3DLargeTask(
            model,
            lr=hparams.get("lr", 1e-4),
            max_epochs=max_epochs,
            kl_warmup_epochs=hparams.get("kl_warmup_epochs", 10),
            kl_warmup_max_beta=hparams.get("kl_warmup_max_beta", 0.1),
            kl_annealing_epochs=hparams.get("kl_annealing_epochs", 100),
        )
    if kind == "vae3d":
        model = models.VAE3D(
            latent_dim=hparams.get("latent_dim", 256), dtype=cdtype
        )
        return tasks.VAE3DTask(
            model, beta=hparams.get("beta", 1e-1), lr=hparams.get("lr", 1e-3)
        )
    if kind == "simple_pointnet_vae":
        model = models.SimplePointNetVAE(
            num_points=hparams.get("num_points", 2048),
            latent_dim=hparams.get("latent_dim", 256),
            dtype=cdtype,
        )
        return tasks.SimplePointNetVAETask(
            model, lr=hparams.get("lr", 1e-4), beta=hparams.get("beta", 1e-1),
            max_epochs=max_epochs,
        )
    if kind == "pointnet_vae":
        model = models.PointNetVAE(
            num_points=hparams.get("num_points", 2048),
            latent_dim=hparams.get("latent_dim", 256),
            dtype=cdtype,
        )
        return tasks.PointNetVAETask(
            model, lr=hparams.get("lr", 1e-4), beta=hparams.get("beta", 1e-1),
            max_epochs=max_epochs,
        )
    raise ValueError(f"Unknown task kind {kind!r}")


def _sample_batch_for(task) -> jnp.ndarray:
    h = task.hparams
    kind = h["task"]
    if kind in ("point_diffusion", "simple_pointnet_vae", "pointnet_vae"):
        return jnp.zeros((2, h.get("num_points", 2048), 3))
    if kind in ("vae3d_large", "vae3d", "latent_diffusion"):
        return jnp.zeros((2, 32, 32, 32, 1))
    raise ValueError(kind)


def load_task_checkpoint(
    path: str, vae_model=None, vae_variables=None, max_epochs: int = 500
) -> Tuple[Any, TrainState, Dict]:
    """Restore (task, state, metadata) from a checkpoint directory."""
    meta = load_checkpoint_meta(path)  # sidecar only — no throwaway restore
    task = task_from_hparams(
        meta.get("hparams", {}), vae_model, vae_variables, max_epochs
    )
    init_state = task.init_state(jax.random.PRNGKey(0), _sample_batch_for(task))
    target = jax.device_get(
        {
            "params": init_state.params,
            "batch_stats": init_state.batch_stats,
            "opt_state": init_state.opt_state,
            "step": init_state.step,
        }
    )
    restored, meta = load_checkpoint(path, target)
    state = init_state.replace(
        params=jax.device_put(restored["params"]),
        batch_stats=jax.device_put(restored["batch_stats"]),
        opt_state=jax.device_put(restored["opt_state"]),
        step=jnp.asarray(restored["step"]),
    )
    return task, state, meta
