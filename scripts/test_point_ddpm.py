#!/usr/bin/env python
"""Evaluate point-DDPM checkpoints: generation + reconstruction with metrics
(reference: test_point_ddpm.py).

Loads every .ckpt under --checkpoint-dir, generates samples and runs the
t=0.01 noise->denoise reconstruction round-trip over validation samples,
computing CD / EMD / voxel-BCE per pair, and writes per-sample PNGs to
test/visualizations/<model_name>/ — same layout and title format as the
reference (test_point_ddpm.py:111-116).
"""

import argparse
import os
import sys
from datetime import datetime

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402

from shapegen_tpu.data import PointCloudDataDirectoryModule  # noqa: E402
from shapegen_tpu.metrics import compute_metrics_batched  # noqa: E402
from shapegen_tpu.train.factory import load_task_checkpoint  # noqa: E402
from shapegen_tpu.utils import (  # noqa: E402
    plot_point_cloud_2d,
    plot_point_cloud_3d,
    save_point_cloud_comparison,
    setup_logger,
)


def test_ddpm_generation(task, state, model_name, logger, num_samples=10,
                         num_points=2048, num_steps=1000):
    samples = jax.device_get(
        task.sample(state, jax.random.PRNGKey(24), num_samples, num_points, num_steps)
    )
    out_dir = os.path.join("test", "visualizations", model_name)
    os.makedirs(out_dir, exist_ok=True)
    for i, sample in enumerate(samples):
        fig1 = plot_point_cloud_3d(sample)
        plt.savefig(os.path.join(out_dir, f"sample_{i}_3d.png"))
        plt.close(fig1)
        fig2 = plot_point_cloud_2d(sample)
        plt.savefig(os.path.join(out_dir, f"sample_{i}_2d.png"))
        plt.close(fig2)
    logger.info(f"Generated and saved {num_samples} samples.")


def test_ddpm_reconstruction(task, state, model_name, data_module, logger,
                             num_samples=10, initial_t=0.010, num_steps=1000,
                             use_gpu_emd=False):
    val_loader = data_module.val_dataloader()
    original = jnp.asarray(next(iter(val_loader))[:num_samples])
    num_samples = original.shape[0]

    t = jnp.full((num_samples,), initial_t)
    noisy, _, _, _ = task.add_noise(jax.random.PRNGKey(1), original, t)
    reconstructed = task.sample3(state, noisy, t, num_steps=num_steps)

    # Device metrics (CD, voxel-BCE, Sinkhorn) for ALL pairs in one jitted
    # dispatch; the exact host Hungarian EMD then overlaps with the device
    # work (SURVEY.md hard part #4). Per-pair values match a sequential
    # compute_metrics loop (the reference's test_point_ddpm.py:85-97).
    cds, emds, recon_losses = compute_metrics_batched(
        original, reconstructed, use_approximate_gpu_emd=use_gpu_emd
    )

    logger.info(f"Average Chamfer Distance: {np.mean(cds):.3f}")
    logger.info(f"Average Earth Mover's Distance: {np.mean(emds):.3f}")
    logger.info(f"Average Reconstruction Loss: {np.mean(recon_losses):.3f}")

    out_dir = os.path.join("test", "visualizations", model_name)
    os.makedirs(out_dir, exist_ok=True)
    orig_np = jax.device_get(original)
    recon_np = jax.device_get(reconstructed)
    for i in range(num_samples):
        vis_path = os.path.join(out_dir, f"comparison_{i}.png")
        title = (
            f"Point Cloud Comparison, Sample: CD (x10^3) = {cds[i]:.3f}, "
            f"EMD = {emds[i]:.3f}, RE = {recon_losses[i]:.3f}"
        )
        save_point_cloud_comparison(
            orig_np[i], recon_np[i], vis_path, title=title,
            title1="Original", title2="Reconstructed",
        )
    logger.info(f"Reconstructed and saved {num_samples} samples.")


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint-dir", required=True)
    p.add_argument("--data-dir", default=os.path.join("data", "shape_net_voxel_data_v1"))
    p.add_argument("--categories", nargs="+", default=["airplane"])
    p.add_argument("--num-samples", type=int, default=16)
    p.add_argument("--num-points", type=int, default=2048)
    p.add_argument("--num-steps", type=int, default=1000)
    p.add_argument("--use-gpu-emd", action="store_true", default=False)
    args = p.parse_args()

    os.makedirs(os.path.join("test", "logs"), exist_ok=True)
    timestamp = datetime.now().strftime("%Y%m%d_%H%M%S")
    log_file = os.path.join("test", "logs", f"test_point_ddpm_log_{timestamp}.log")
    logger = setup_logger(log_file, "test_logger_point_ddpm")

    logger.info("Starting test script")
    logger.info(f"Checkpoint directory: {args.checkpoint_dir}")
    logger.info(f"Data directory: {args.data_dir}")
    logger.info(f"Number of samples: {args.num_samples}")
    logger.info(f"Number of points: {args.num_points}")

    data_module = PointCloudDataDirectoryModule(
        args.data_dir, num_points=args.num_points, batch_size=args.num_samples,
        file_mode="voxels", output_mode="point_clouds", augmentations=False,
        relevant_object_categories=args.categories,
    )
    data_module.setup()

    subdirectory_name = os.path.basename(os.path.normpath(args.checkpoint_dir))
    for file_name in sorted(os.listdir(args.checkpoint_dir)):
        if not file_name.endswith(".ckpt"):
            continue
        checkpoint_path = os.path.join(args.checkpoint_dir, file_name)
        model_name = f"{subdirectory_name}-{file_name[:-5]}"
        logger.info(f"Testing model: {model_name}")
        task, state, _ = load_task_checkpoint(checkpoint_path)
        test_ddpm_generation(
            task, state, model_name, logger, args.num_samples,
            args.num_points, args.num_steps,
        )
        test_ddpm_reconstruction(
            task, state, model_name, data_module, logger, args.num_samples,
            num_steps=args.num_steps, use_gpu_emd=args.use_gpu_emd,
        )


if __name__ == "__main__":
    main()
