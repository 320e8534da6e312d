#!/usr/bin/env python
"""Train the point-cloud DDPM (reference: train_point_ddpm.py).

Defaults mirror the reference's hardcoded constants (train_point_ddpm.py:
33-48): 2048 points, batch 16, category ['chair'], no augmentations, 500
epochs, seed 24 — but exposed as real flags instead of edit-the-constants.
Output layout parity: checkpoints/point_ddpm/<timestamp>/..., TensorBoard
under lightning_logs/point_cloud_diffusion, timestamped log file under
train/logs/, and 10 post-training sample PNGs.
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
from shapegen_tpu.parallel import initialize_distributed, make_mesh  # noqa: E402
from shapegen_tpu.train import Trainer, TrainerConfig, tasks  # noqa: E402
from shapegen_tpu.utils import (  # noqa: E402
    plot_point_cloud_2d,
    plot_point_cloud_3d,
    setup_logger,
)


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data-dir", default=os.path.join("data", "shape_net_voxel_data_v1"))
    p.add_argument("--num-points", type=int, default=2048)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--categories", nargs="+", default=["chair"])
    p.add_argument("--augmentations", action="store_true", default=False)
    p.add_argument("--max-epochs", type=int, default=500)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--noise-schedule", default="cosine", choices=["cosine", "linear"])
    p.add_argument("--compute-dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="model compute dtype (params/optimizer/loss stay "
                        "f32). bfloat16 gives ~1.3x train-step throughput "
                        "on TPU (BASELINE.md); float32 = exact reference "
                        "numerics")
    p.add_argument("--lr-schedule", default="plateau",
                   choices=["plateau", "none"],
                   help="plateau = reference ReduceLROnPlateau(0.5, 5); "
                        "none = constant lr (extension)")
    p.add_argument("--dim", type=int, default=256)
    p.add_argument("--time-dim", type=int, default=256)
    p.add_argument("--seed", type=int, default=24)
    p.add_argument("--checkpoint", default=None, help="resume from this ckpt")
    p.add_argument("--auto-resume-dir", default=None,
                   help="resume from the latest checkpoint in this directory")
    p.add_argument("--conditional", action="store_true", default=False,
                   help="category-conditional model with classifier-free "
                        "guidance (extension over the reference)")
    p.add_argument("--num-devices", type=int, default=None,
                   help="data-parallel mesh size (default: all devices)")
    p.add_argument("--model-parallel", type=int, default=1,
                   help="tensor-parallel axis size: a 2-D (data, model) "
                        "mesh shards the denoiser's global-feature chain "
                        "over this many devices (POINT_UNET_LARGE_TP_RULES;"
                        " memory headroom, not speed — DP is the perf "
                        "default, docs/ARCHITECTURE.md)")
    p.add_argument("--ema-decay", type=float, default=0.0,
                   help="EXTENSION: keep an exponential moving average of "
                        "the params (e.g. 0.999), saved as a sibling .ema "
                        "payload next to every checkpoint; 0 disables "
                        "(reference-parity default). Evaluate with "
                        "eval_conditional.py --use-ema.")
    p.add_argument("--viz-samples", type=int, default=4,
                   help="epoch-end generated-sample figures (0 disables)")
    p.add_argument("--viz-steps", type=int, default=1000)
    p.add_argument("--final-samples", type=int, default=10)
    p.add_argument("--ckpt-root", default="checkpoints")
    p.add_argument("--tb-dir", default="lightning_logs")
    p.add_argument("--save-top-k", type=int, default=10,
                   help="top-k checkpoints per monitor (reference: 10)")
    p.add_argument("--save-top-k-train", type=int, default=None,
                   help="top-k override for the train_loss monitor only "
                        "(0 disables it; default: same as --save-top-k). "
                        "Long tunnel-bound runs that only need the best-val "
                        "checkpoint avoid the per-admission state fetch.")
    p.add_argument("--val-every", type=int, default=1,
                   help="validate every N epochs (reference default 1; a "
                        "speed knob for long runs — val-monitored "
                        "checkpoint admissions follow this cadence)")
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


def main():
    args = parse_args()
    # Multi-host (pod) runs: no-op unless the JAX_COORDINATOR_ADDRESS
    # family of env vars is set (single-host reference-parity default).
    initialize_distributed()
    timestamp = datetime.now().strftime("%Y%m%d_%H%M%S")
    os.makedirs(os.path.join("train", "logs"), exist_ok=True)
    log_file = os.path.join("train", "logs", f"train_point_ddpm_log_{timestamp}.log")
    logger = setup_logger(log_file, "train_point_ddpm")

    data_module = PointCloudDataDirectoryModule(
        args.data_dir,
        num_points=args.num_points,
        batch_size=args.batch_size,
        file_mode="voxels",
        output_mode="point_clouds",
        augmentations=args.augmentations,
        relevant_object_categories=args.categories,
        seed=args.seed,
        return_labels=args.conditional,
    )
    num_classes = 55 if args.conditional else None

    if args.auto_resume_dir and not args.checkpoint:
        from shapegen_tpu.train.checkpoints import find_latest_checkpoint

        latest = find_latest_checkpoint(args.auto_resume_dir)
        if latest:
            args.checkpoint = latest
            logger.info(f"Auto-resume: latest checkpoint is {latest}")

    if args.checkpoint:
        # Rebuild the task from stored hparams (Lightning's argument-free
        # load_from_checkpoint parity, train_point_ddpm.py:51-54); fit() then
        # restores params/optimizer/epoch/scheduler from the checkpoint.
        import json as _json

        from shapegen_tpu.train.factory import task_from_hparams

        logger.info(f"Loading Diffusion model from checkpoint: {args.checkpoint}")
        with open(args.checkpoint + ".json") as f:
            hparams = _json.load(f).get("hparams", {})
        task = task_from_hparams(hparams, max_epochs=args.max_epochs)
        assert task.num_points == args.num_points
    else:
        model = models.PointUNetLarge(
            dim=args.dim, time_dim=args.time_dim, num_classes=num_classes,
            dtype=jnp.dtype(args.compute_dtype),
        )
        task = tasks.PointDiffusionTask(
            model, num_points=args.num_points, lr=args.lr,
            noise_schedule=args.noise_schedule, num_classes=num_classes,
            lr_schedule=args.lr_schedule,
        )

    # A mesh is mandatory on pods: per-host input shards only combine into
    # one training run through the data-sharded step (otherwise every
    # process would silently train its own model on a disjoint shard).
    use_mesh = (args.num_devices or 1) > 1 or jax.process_count() > 1
    sharding_rules = None
    if args.model_parallel > 1:
        from shapegen_tpu.models.point_unet import POINT_UNET_LARGE_TP_RULES

        n = args.num_devices or jax.device_count()
        if n % args.model_parallel:
            raise SystemExit(
                f"--model-parallel {args.model_parallel} must divide the "
                f"mesh size {n}"
            )
        mesh = make_mesh(
            n, axis_names=("data", "model"),
            mesh_shape=(n // args.model_parallel, args.model_parallel),
        )
        sharding_rules = POINT_UNET_LARGE_TP_RULES
    else:
        mesh = make_mesh(args.num_devices) if use_mesh else None

    def on_epoch_end(trainer, state, epoch):
        # Epoch-end sample figures (diffusion.py:339-358 parity).
        if args.viz_samples <= 0:
            return
        key = jax.random.fold_in(jax.random.PRNGKey(args.seed), 777 + epoch)
        samples = task.sample(
            state, key, args.viz_samples, args.num_points, args.viz_steps
        )
        for i, sample in enumerate(jax.device_get(samples)):
            fig = plot_point_cloud_3d(sample)
            trainer.add_figure(f"diffusion_generated_sample_3d_{i}", fig, epoch)
            plt.close(fig)
            fig = plot_point_cloud_2d(sample)
            trainer.add_figure(f"diffusion_generated_sample_2d_{i}", fig, epoch)
            plt.close(fig)

    def on_val_batch_reconstruction(
        trainer, state, epoch, batch_idx, num_val_batches, batch
    ):
        # Validation reconstruction round-trip figures at the reference's
        # cadence: every (num_val_batches // 5) validation batches, add
        # t=0.01 noise to the middle sample of the batch and denoise via
        # sample3 (diffusion.py:114-136). Tag names match the reference's
        # add_figure calls.
        if args.viz_samples <= 0:
            return
        interval = max(num_val_batches // 5, 1)
        if batch_idx % interval != 0:
            return
        img_idx = batch_idx // interval
        points = batch[0] if isinstance(batch, (tuple, list)) else batch
        sample_idx = points.shape[0] // 2
        x = points[sample_idx : sample_idx + 1]
        t = jnp.full((1,), 0.01)
        noisy, _, _, _ = task.add_noise(
            jax.random.fold_in(
                jax.random.PRNGKey(args.seed), 999 + epoch * 100 + batch_idx
            ),
            x, t,
        )
        recon = task.sample3(state, noisy, t, num_steps=args.viz_steps)
        from shapegen_tpu.utils import plot_comparison_point_clouds

        fig = plot_comparison_point_clouds(
            jax.device_get(x[0]), jax.device_get(recon[0]),
            "Point Cloud Comparison", "Input", "Reconstructed",
        )
        trainer.add_figure(
            f"input_vs_reconstructed_point_cloud_3d_{img_idx}_{sample_idx}",
            fig, epoch,
        )
        plt.close(fig)
        fig = plot_point_cloud_2d(jax.device_get(x[0]))
        trainer.add_figure(
            f"input_point_cloud_2d_{img_idx}_{sample_idx}", fig, epoch
        )
        plt.close(fig)

    cfg = TrainerConfig(
        max_epochs=args.max_epochs,
        ckpt_dir=os.path.join(args.ckpt_root, "point_ddpm", timestamp),
        ckpt_prefix="point_cloud_diffusion",
        save_top_k=args.save_top_k,
        save_last_every=args.save_last_every,
        profile_dir=args.profile_dir,
        profile_epochs=args.profile_epochs,
        tb_dir=args.tb_dir,
        tb_name="point_cloud_diffusion",
        seed=args.seed,
        ema_decay=args.ema_decay or None,
        save_top_k_train=args.save_top_k_train,
        val_every_epochs=args.val_every,
    )
    trainer = Trainer(
        task, cfg, mesh=mesh, logger=logger,
        epoch_end_hooks=[on_epoch_end],
        val_batch_hooks=[on_val_batch_reconstruction],
        sharding_rules=sharding_rules,
    )

    logger.info("Starting Diffusion Training")
    state = trainer.fit(data_module, resume_from=args.checkpoint)

    # Post-training samples (train_point_ddpm.py:91-99 parity).
    if args.final_samples > 0:
        samples = task.sample(
            state, jax.random.PRNGKey(args.seed), args.final_samples,
            args.num_points,
        )
        for i, sample in enumerate(jax.device_get(samples)):
            fig = plot_point_cloud_3d(sample)
            plt.savefig(f"generated_diffusion_sample_{i}.png")
            plt.close(fig)

    logger.info(f"Training completed at {datetime.now().strftime('%Y-%m-%d %H:%M:%S')}")
    logger.info(f"Generated {args.final_samples} samples")


if __name__ == "__main__":
    main()
