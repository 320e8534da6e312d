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
from shapegen_tpu.utils import (  # noqa: E402
    plot_comparison_point_clouds,
    plot_point_cloud_2d,
    plot_point_cloud_3d,
    setup_logger,
)


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
    p.add_argument("--model-parallel", type=int, default=1,
                   help="tensor-parallel axis size for the LATENT-DIFFUSION "
                        "phase: a 2-D (data, model) mesh shards the latent "
                        "UNet's global-feature chain over this many devices "
                        "(SIMPLE_LATENT_UNET_TP_RULES; must divide the mesh "
                        "size and the GroupNorm group count 8). The VAE "
                        "phase has no TP rules and runs data-parallel over "
                        "the same mesh's 'data' axis.")
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
    p.add_argument("--viz-samples", type=int, default=4,
                   help="TensorBoard figures: generated samples per epoch "
                        "and validation round-trip figures (reference "
                        "num_samples=4; 0 disables the figure side-channel)")
    p.add_argument("--viz-steps", type=int, default=1000,
                   help="denoising steps for the LDM figure samplers")
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


def make_vae_hooks(args, task, kind):
    """The reference's in-training TensorBoard figure side-channel, per VAE
    family. Validation batches: every ``num_val_batches // 5`` batches the
    voxel VAE3DLarge logs an input-vs-reconstruction comparison
    (networks.py:2418-2443) while the other families log the input cloud
    only (networks.py:1343-1361, 1905-1926, 2140-2160). Epoch end: 4 prior
    samples as ``vae_generated_sample_{3d,2d}_{i}`` (networks.py:2470-2490
    and the same hook on every VAE), empty decoded clouds skipped."""
    if args.viz_samples <= 0:
        return [], []
    is_voxel = kind in ("vae3d_large", "vae3d")

    def _vars(state):
        v = {"params": state.params}
        if state.batch_stats:
            v["batch_stats"] = state.batch_stats
        return v

    def on_val_batch(trainer, state, epoch, batch_idx, num_val_batches, batch):
        interval = max(num_val_batches // 5, 1)
        if batch_idx % interval != 0:
            return
        img_idx = batch_idx // interval
        if kind == "vae3d_large":
            sample_idx = batch.shape[0] // 2
            x = batch[sample_idx : sample_idx + 1]
            rng = jax.random.fold_in(
                jax.random.PRNGKey(args.seed), 3000 + epoch * 100 + batch_idx
            )
            recon, _, _ = task.model.apply(_vars(state), x, rng, train=False)
            # Input and reconstruction at the conversion default 0.5
            # (utils.py:511); the epoch-end sampler below uses 0.4.
            inp = voxels_to_point_cloud_list(x, 0.5, args.max_decode_points)[0]
            rec = voxels_to_point_cloud_list(recon, 0.5, args.max_decode_points)[0]
            fig = plot_comparison_point_clouds(
                inp, rec, "Point Cloud Comparison", "Input", "Reconstructed"
            )
            trainer.add_figure(
                f"input_vs_reconstructed_point_cloud_3d_{img_idx}_{sample_idx}",
                fig, epoch,
            )
            plt.close(fig)
            fig = plot_point_cloud_2d(inp)
            trainer.add_figure(
                f"input_point_cloud_2d_{img_idx}_{sample_idx}", fig, epoch
            )
            plt.close(fig)
            return
        if is_voxel:  # vae3d: input-only figures from the first voxel grid
            inp = voxels_to_point_cloud_list(
                batch[:1], 0.5, args.max_decode_points
            )[0]
        else:  # point VAEs: the first input cloud directly
            inp = jax.device_get(batch[0])
        fig = plot_point_cloud_3d(inp)
        trainer.add_figure(f"input_point_cloud_3d_{img_idx}_0", fig, epoch)
        plt.close(fig)
        fig = plot_point_cloud_2d(inp)
        trainer.add_figure(f"input_point_cloud_2d_{img_idx}_0", fig, epoch)
        plt.close(fig)

    def on_epoch_end(trainer, state, epoch):
        key = jax.random.fold_in(jax.random.PRNGKey(args.seed), 555 + epoch)
        if is_voxel:
            vox = task.sample_voxels(state, key, args.viz_samples)
            # Sample decode threshold 0.4 (networks.py:2163, 2447).
            samples = voxels_to_point_cloud_list(vox, 0.4, args.max_decode_points)
        else:
            samples = jax.device_get(task.sample(state, key, args.viz_samples))
        for i, sample in enumerate(samples):
            if len(sample) == 0:
                continue  # networks.py:2480-2482
            fig = plot_point_cloud_3d(sample)
            trainer.add_figure(f"vae_generated_sample_3d_{i}", fig, epoch)
            plt.close(fig)
            fig = plot_point_cloud_2d(sample)
            trainer.add_figure(f"vae_generated_sample_2d_{i}", fig, epoch)
            plt.close(fig)

    return [on_epoch_end], [on_val_batch]


def make_ldm_hooks(args, task):
    """LatentDiffusion figure side-channel: every ``num_val_batches // 5``
    validation batches, a frozen-VAE latent round-trip (encode -> t=0.01
    noise on z[0] -> sample3 -> decode) compared against the middle input
    sample (diffusion.py:446-487 — the input uses sample_idx while the
    round-trip uses z[0]; quirk preserved); epoch end logs 4 generated
    samples as ``latent_diffusion_generated_sample_{3d,2d}_{i}``
    (diffusion.py:715-734)."""
    if args.viz_samples <= 0:
        return [], []

    def _decode_clouds(x, threshold):
        if task.is_voxel_based:
            return voxels_to_point_cloud_list(x, threshold, args.max_decode_points)
        # Non-voxel LDM decode returns point clouds directly. (The
        # reference's sample() hits a NameError on this path,
        # diffusion.py:700-707 — behaving sanely here is deliberate.)
        return list(jax.device_get(x))

    def on_val_batch(trainer, state, epoch, batch_idx, num_val_batches, batch):
        interval = max(num_val_batches // 5, 1)
        if batch_idx % interval != 0:
            return
        img_idx = batch_idx // interval
        sample_idx = batch.shape[0] // 2
        key = jax.random.fold_in(
            jax.random.PRNGKey(args.seed), 4000 + epoch * 100 + batch_idx
        )
        e_key, n_key = jax.random.split(key)
        z = task.encode(batch, e_key)
        t = jnp.full((1,), 0.01)
        z_noisy, _, _, _ = task.add_noise(n_key, z[0:1], t)
        z0 = task.sample3_latents(state, z_noisy, t, num_steps=args.viz_steps)
        x = task.decode(z0)
        # Round-trip decodes at the sampler default 0.4 (diffusion.py:656);
        # the input figure converts at the utils default 0.5.
        rec = _decode_clouds(x, 0.4)[0]
        if task.is_voxel_based:
            inp = voxels_to_point_cloud_list(
                batch[sample_idx : sample_idx + 1], 0.5, args.max_decode_points
            )[0]
        else:
            inp = jax.device_get(batch[sample_idx])
        fig = plot_comparison_point_clouds(
            inp, rec, "Point Cloud Comparison", "Input", "Reconstructed"
        )
        trainer.add_figure(
            f"input_vs_reconstructed_point_cloud_3d_{img_idx}_{sample_idx}",
            fig, epoch,
        )
        plt.close(fig)
        fig = plot_point_cloud_2d(inp)
        trainer.add_figure(
            f"input_point_cloud_2d_{img_idx}_{sample_idx}", fig, epoch
        )
        plt.close(fig)

    def on_epoch_end(trainer, state, epoch):
        key = jax.random.fold_in(jax.random.PRNGKey(args.seed), 666 + epoch)
        z0 = task.sample_latents(
            state, key, args.viz_samples, num_steps=args.viz_steps
        )
        samples = _decode_clouds(task.decode(z0), 0.4)
        for i, sample in enumerate(samples):
            if len(sample) == 0:
                continue
            fig = plot_point_cloud_3d(sample)
            trainer.add_figure(
                f"latent_diffusion_generated_sample_3d_{i}", fig, epoch
            )
            plt.close(fig)
            fig = plot_point_cloud_2d(sample)
            trainer.add_figure(
                f"latent_diffusion_generated_sample_2d_{i}", fig, epoch
            )
            plt.close(fig)

    return [on_epoch_end], [on_val_batch]


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
    epoch_end_hooks, val_batch_hooks = make_vae_hooks(args, task, _vae_kind(args))
    trainer = Trainer(
        task, cfg, mesh=mesh, logger=logger,
        epoch_end_hooks=epoch_end_hooks, val_batch_hooks=val_batch_hooks,
    )
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
    sharding_rules = None
    if args.model_parallel > 1:
        from shapegen_tpu.models.latent_unet import SIMPLE_LATENT_UNET_TP_RULES

        sharding_rules = SIMPLE_LATENT_UNET_TP_RULES
    epoch_end_hooks, val_batch_hooks = make_ldm_hooks(args, task)
    trainer = Trainer(
        task, cfg, mesh=mesh, logger=logger,
        epoch_end_hooks=epoch_end_hooks, val_batch_hooks=val_batch_hooks,
        sharding_rules=sharding_rules,
    )
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
    if args.model_parallel > 1:
        from shapegen_tpu.models.latent_unet import LATENT_UNET_TP_MAX_MODEL

        n = args.num_devices or jax.device_count()
        if n % args.model_parallel:
            raise SystemExit(
                f"--model-parallel {args.model_parallel} must divide the "
                f"mesh size {n}"
            )
        if LATENT_UNET_TP_MAX_MODEL % args.model_parallel:
            raise SystemExit(
                f"--model-parallel {args.model_parallel} must divide the "
                f"latent UNet's GroupNorm group count "
                f"({LATENT_UNET_TP_MAX_MODEL}) so group statistics stay "
                "shard-local"
            )
        mesh = make_mesh(
            n, axis_names=("data", "model"),
            mesh_shape=(n // args.model_parallel, args.model_parallel),
        )
    else:
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
