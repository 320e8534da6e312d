#!/usr/bin/env python
"""Two-phase latent-diffusion training: VAE then LDM (reference:
train_point_ldm.py).

Defaults mirror the reference constants (train_point_ldm.py:148-236):
voxel-based VAE3DLarge, category ['airplane'], batch 16, 500 epochs, VAE
training on / diffusion training off, decode threshold 0.4 for samples.
"""

import argparse
import os
import sys
from datetime import datetime

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import matplotlib.pyplot as plt  # noqa: E402

from shapegen_tpu import models  # noqa: E402
from shapegen_tpu.data import PointCloudDataDirectoryModule  # noqa: E402
from shapegen_tpu.ops import voxel_to_points_padded  # noqa: E402
from shapegen_tpu.parallel import initialize_distributed, make_mesh  # noqa: E402
from shapegen_tpu.train import Trainer, TrainerConfig, tasks  # noqa: E402
from shapegen_tpu.train.factory import load_task_checkpoint  # noqa: E402
from shapegen_tpu.utils import plot_point_cloud_3d, setup_logger  # noqa: E402


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data-dir", default=os.path.join("data", "shape_net_voxel_data_v1"))
    p.add_argument("--num-points", type=int, default=2048)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--categories", nargs="+", default=["airplane"])
    p.add_argument("--augmentations", action="store_true", default=False)
    p.add_argument("--max-epochs", type=int, default=500)
    p.add_argument("--latent-dim", type=int, default=256)
    p.add_argument("--seed", type=int, default=24)
    p.add_argument("--point-based-vae", action="store_true", default=False,
                   help="use the PointNet++/Folding VAE instead of VAE3DLarge")
    p.add_argument("--vae-kind", default=None,
                   choices=["vae3d_large", "vae3d", "pointnet", "simple_pointnet"],
                   help="explicit VAE family (overrides --point-based-vae); "
                        "vae3d_large is the reference default "
                        "(train_point_ldm.py:21)")
    p.add_argument("--skip-vae-training", action="store_true", default=False)
    p.add_argument("--skip-diffusion-training", action="store_true", default=True)
    p.add_argument("--train-diffusion", dest="skip_diffusion_training",
                   action="store_false",
                   help="also train the latent diffusion phase")
    p.add_argument("--vae-checkpoint", default=None)
    p.add_argument("--diffusion-checkpoint", default=None)
    p.add_argument("--num-devices", type=int, default=None)
    p.add_argument("--sample-threshold", type=float, default=0.4)
    p.add_argument("--final-samples", type=int, default=10)
    p.add_argument("--max-decode-points", type=int, default=8192)
    p.add_argument("--ckpt-root", default="checkpoints")
    p.add_argument("--tb-dir", default="lightning_logs")
    p.add_argument("--compute-dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="model compute dtype for the VAE and latent UNet "
                        "(params/optimizer/loss stay f32); float32 = exact "
                        "reference numerics")
    p.add_argument("--save-top-k", type=int, default=10,
                   help="top-k checkpoints per monitor (reference: 10)")
    p.add_argument("--save-last-every", type=int, default=1,
                   help="rolling last.ckpt cadence in epochs; raise on "
                        "slow-transfer links (the full-state fetch costs "
                        "~10s/ckpt for the 21.5M model over the axon tunnel)")
    p.add_argument("--profile-dir", default=None,
                   help="capture a jax.profiler device trace of the first "
                        "--profile-epochs epochs into this directory "
                        "(TensorBoard/Perfetto)")
    p.add_argument("--profile-epochs", type=int, default=1)
    return p.parse_args()


def voxels_to_point_cloud_list(voxels, threshold, max_points):
    """Decode -> padded device conversion -> de-padded host list
    (utils.py:511-538 ragged boundary, de-padded only at this host edge)."""
    grids = jnp.squeeze(voxels, axis=-1)  # (B, D, H, W)
    pts, mask, count = voxel_to_points_padded(
        grids, max_points=max_points, threshold=threshold
    )
    pts, count = jax.device_get((pts, count))
    return [p[:c] for p, c in zip(pts, count)]


def _vae_kind(args) -> str:
    if args.vae_kind:
        return args.vae_kind
    return "pointnet" if args.point_based_vae else "vae3d_large"


def build_vae_task(args):
    kind = _vae_kind(args)
    if kind == "vae3d_large":
        return tasks.VAE3DLargeTask(
            models.VAE3DLarge(latent_dim=args.latent_dim,
                              dtype=jnp.dtype(args.compute_dtype)),
            max_epochs=args.max_epochs,
        )
    if kind == "vae3d":
        return tasks.VAE3DTask(models.VAE3D(
            latent_dim=args.latent_dim, dtype=jnp.dtype(args.compute_dtype)))
    if kind == "pointnet":
        return tasks.PointNetVAETask(
            models.PointNetVAE(num_points=args.num_points,
                               latent_dim=args.latent_dim),
            max_epochs=args.max_epochs,
        )
    if kind == "simple_pointnet":
        return tasks.SimplePointNetVAETask(
            models.SimplePointNetVAE(num_points=args.num_points,
                                     latent_dim=args.latent_dim),
            max_epochs=args.max_epochs,
        )
    raise ValueError(kind)


def train_vae(args, data_module, logger, timestamp, mesh):
    if args.vae_checkpoint and args.skip_vae_training:
        logger.info(f"Loading VAE model from checkpoint: {args.vae_checkpoint}")
        task, state, _ = load_task_checkpoint(
            args.vae_checkpoint, max_epochs=args.max_epochs
        )
        return task, state

    task = build_vae_task(args)

    cfg = TrainerConfig(
        max_epochs=args.max_epochs,
        ckpt_dir=os.path.join(args.ckpt_root, "point_ldm", timestamp),
        ckpt_prefix="vae",
        save_top_k=args.save_top_k,
        save_last_every=args.save_last_every,
        profile_dir=args.profile_dir,
        profile_epochs=args.profile_epochs,
        tb_dir=args.tb_dir,
        tb_name="vae",
        seed=args.seed,
    )
    trainer = Trainer(task, cfg, mesh=mesh, logger=logger)
    state = trainer.fit(data_module, resume_from=args.vae_checkpoint)
    return task, state


def train_diffusion(args, data_module, vae_task, vae_state, logger, timestamp, mesh):
    vae_variables = {"params": vae_state.params}
    if vae_state.batch_stats:
        vae_variables["batch_stats"] = vae_state.batch_stats

    if args.diffusion_checkpoint and not args.skip_diffusion_training:
        logger.info(
            f"Loading Diffusion model from checkpoint: {args.diffusion_checkpoint}"
        )

    latent_model = models.SimpleLatentUNet(
        latent_dim=args.latent_dim, dim=512, time_dim=256,
        dtype=jnp.dtype(args.compute_dtype),
    )
    task = tasks.LatentDiffusionTask(
        latent_model,
        vae_task.model,
        vae_variables,
        latent_dim=args.latent_dim,
        is_voxel_based=_vae_kind(args) in ("vae3d_large", "vae3d"),
        max_epochs=args.max_epochs,
    )
    cfg = TrainerConfig(
        max_epochs=args.max_epochs,
        ckpt_dir=os.path.join(args.ckpt_root, "point_ldm", timestamp),
        ckpt_prefix="latent_diffusion",
        save_top_k=args.save_top_k,
        save_last_every=args.save_last_every,
        profile_dir=args.profile_dir,
        profile_epochs=args.profile_epochs,
        tb_dir=args.tb_dir,
        tb_name="latent_diffusion",
        seed=args.seed,
    )
    trainer = Trainer(task, cfg, mesh=mesh, logger=logger)
    state = trainer.fit(data_module, resume_from=args.diffusion_checkpoint)
    return task, state


def main():
    args = parse_args()
    # Multi-host (pod) runs: no-op unless the JAX_COORDINATOR_ADDRESS
    # family of env vars is set (single-host reference-parity default).
    initialize_distributed()
    timestamp = datetime.now().strftime("%Y%m%d_%H%M%S")
    os.makedirs(os.path.join("train", "logs"), exist_ok=True)
    log_file = os.path.join("train", "logs", f"train_point_ldm_log_{timestamp}.log")
    logger = setup_logger(log_file, "train_point_ldm")

    is_voxel_based = _vae_kind(args) in ("vae3d_large", "vae3d")
    data_module = PointCloudDataDirectoryModule(
        args.data_dir,
        num_points=args.num_points,
        batch_size=args.batch_size,
        file_mode="voxels",
        output_mode="voxels" if is_voxel_based else "point_clouds",
        augmentations=args.augmentations,
        relevant_object_categories=args.categories,
        seed=args.seed,
    )
    # A mesh is mandatory on pods: per-host input shards only combine into
    # one training run through the data-sharded step (otherwise every
    # process would silently train its own model on a disjoint shard).
    use_mesh = (args.num_devices or 1) > 1 or jax.process_count() > 1
    mesh = make_mesh(args.num_devices) if use_mesh else None

    logger.info("Starting VAE Training" if not args.skip_vae_training else "Loading VAE")
    vae_task, vae_state = train_vae(args, data_module, logger, timestamp, mesh)

    # VAE prior samples -> PNGs (train_point_ldm.py:194-203 parity).
    if is_voxel_based:
        vox = vae_task.sample_voxels(
            vae_state, jax.random.PRNGKey(args.seed), args.final_samples
        )
        samples = voxels_to_point_cloud_list(
            vox, args.sample_threshold, args.max_decode_points
        )
    else:
        samples = jax.device_get(
            vae_task.sample(vae_state, jax.random.PRNGKey(args.seed), args.final_samples)
        )
    for i, sample in enumerate(samples):
        fig = plot_point_cloud_3d(sample)
        plt.savefig(f"generated_vae_sample_{i}.png")
        plt.close(fig)
    logger.info(f"Generated {args.final_samples} VAE samples")

    if args.skip_diffusion_training and args.diffusion_checkpoint is None:
        logger.info("Skipping diffusion training and/or inference")
        return

    logger.info("Starting Latent Diffusion Training")
    ldm_task, ldm_state = train_diffusion(
        args, data_module, vae_task, vae_state, logger, timestamp, mesh
    )

    # LDM samples -> decode -> point clouds -> PNGs (train_point_ldm.py:224-231).
    z0 = ldm_task.sample_latents(
        ldm_state, jax.random.PRNGKey(args.seed + 1), args.final_samples
    )
    x0 = ldm_task.decode(z0)
    if is_voxel_based:
        samples = voxels_to_point_cloud_list(
            x0, args.sample_threshold, args.max_decode_points
        )
    else:
        samples = jax.device_get(x0)
    for i, sample in enumerate(samples):
        fig = plot_point_cloud_3d(sample)
        plt.savefig(f"generated_latent_diffusion_sample_{i}.png")
        plt.close(fig)

    logger.info(f"Training completed at {datetime.now().strftime('%Y-%m-%d %H:%M:%S')}")
    logger.info(f"Generated {args.final_samples} diffusion denoised samples")


if __name__ == "__main__":
    main()
