#!/usr/bin/env python
"""Evaluate 3D-VAE checkpoints: generation + reconstruction with metrics
(reference: test_point_ldm.py).

Loads every .ckpt under --checkpoint-dir, generates prior samples (threshold
0.5, test_point_ldm.py:128) and runs the full VAE forward reconstruction,
converting voxels to point clouds and computing CD / EMD / voxel-BCE per
pair; writes PNGs to test/visualizations/<model_name>/.
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
from shapegen_tpu.metrics import (  # noqa: E402
    chamfer_distance,
    sinkhorn_emd,
    voxel_bce_recon_loss,
)
from shapegen_tpu.ops import voxel_to_points_padded  # noqa: E402
from shapegen_tpu.train.factory import load_task_checkpoint  # noqa: E402
from shapegen_tpu.utils import (  # noqa: E402
    plot_point_cloud_2d,
    plot_point_cloud_3d,
    save_point_cloud_comparison,
    setup_logger,
)


def voxels_to_list(voxels, threshold, max_points=8192):
    grids = jnp.squeeze(jnp.asarray(voxels), axis=-1)
    pts, mask, count = voxel_to_points_padded(grids, max_points, threshold)
    pts, count = jax.device_get((pts, count))
    return [p[:c] for p, c in zip(pts, count)]


def test_vae_generation(task, state, model_name, logger, num_samples=10,
                        threshold=0.5):
    vox = task.sample_voxels(state, jax.random.PRNGKey(24), num_samples)
    samples = voxels_to_list(vox, threshold)
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


def test_vae_reconstruction(task, state, model_name, data_module, logger,
                            num_samples=10, threshold=0.5, use_gpu_emd=False):
    val_loader = data_module.val_dataloader()
    original_voxels = jnp.asarray(next(iter(val_loader))[:num_samples])
    num_samples = original_voxels.shape[0]

    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
    recon_voxels, _, _ = task.model.apply(
        variables, original_voxels, jax.random.PRNGKey(2), train=False
    )

    originals = voxels_to_list(original_voxels, threshold)
    recons = voxels_to_list(recon_voxels, threshold)

    # Device/host overlap on ragged pairs (SURVEY.md hard part #4): the
    # clouds here have per-pair lengths (voxel occupancy varies), so instead
    # of one batched program, ALL per-pair device metrics are dispatched
    # asynchronously up front; the O(n^3) host Hungarian then runs while the
    # device drains its queue, and the final float() fetches collect results.
    from shapegen_tpu.metrics.metrics import _hungarian_pairs_host

    device_work = []
    for orig, recon in zip(originals, recons):
        if len(orig) == 0 or len(recon) == 0:
            device_work.append(None)
            continue
        o, r = jnp.asarray(orig), jnp.asarray(recon)
        cd = chamfer_distance(o, r)
        bce = voxel_bce_recon_loss(o, r)
        emd_dev = sinkhorn_emd(o, r) if use_gpu_emd else None
        device_work.append((o, r, cd, bce, emd_dev))

    cds, emds, recon_losses = [], [], []
    for work in device_work:
        if work is None:
            cds.append(float("nan"))
            emds.append(float("nan"))
            recon_losses.append(float("nan"))
            continue
        o, r, cd, bce, emd_dev = work
        if use_gpu_emd:
            emd = float(emd_dev)
        else:
            # Inputs are already materialized; this does not wait on the
            # queued device metrics.
            emd = float(
                _hungarian_pairs_host(
                    np.asarray(jax.device_get(o))[None],
                    np.asarray(jax.device_get(r))[None],
                )[0]
            )
        cds.append(float(cd))
        emds.append(emd)
        recon_losses.append(float(bce))

    logger.info(f"Average Chamfer Distance: {np.nanmean(cds):.3f}")
    logger.info(f"Average Earth Mover's Distance: {np.nanmean(emds):.3f}")
    logger.info(f"Average Reconstruction Loss: {np.nanmean(recon_losses):.3f}")

    out_dir = os.path.join("test", "visualizations", model_name)
    os.makedirs(out_dir, exist_ok=True)
    for i, (orig, recon) in enumerate(zip(originals, recons)):
        vis_path = os.path.join(out_dir, f"comparison_{i}.png")
        title = (
            f"Point Cloud Comparison, Sample: CD (x10^3) = {cds[i]:.3f}, "
            f"EMD = {emds[i]:.3f}, RE = {recon_losses[i]:.3f}"
        )
        save_point_cloud_comparison(
            orig, recon, vis_path, title=title,
            title1="Original", title2="Reconstructed",
        )
    logger.info(f"Reconstructed and saved {num_samples} samples.")


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint-dir", required=True)
    p.add_argument("--data-dir", default=os.path.join("data", "shape_net_voxel_data_v1"))
    p.add_argument("--categories", nargs="+", default=["table"])
    p.add_argument("--num-samples", type=int, default=16)
    p.add_argument("--threshold", type=float, default=0.5)
    p.add_argument("--use-gpu-emd", action="store_true", default=False)
    args = p.parse_args()

    os.makedirs(os.path.join("test", "logs"), exist_ok=True)
    timestamp = datetime.now().strftime("%Y%m%d_%H%M%S")
    log_file = os.path.join("test", "logs", f"test_point_ldm_log_{timestamp}.log")
    logger = setup_logger(log_file, "test_logger_point_ldm")

    logger.info("Starting test script")
    logger.info(f"Checkpoint directory: {args.checkpoint_dir}")
    logger.info(f"Data directory: {args.data_dir}")
    logger.info(f"Number of samples: {args.num_samples}")

    data_module = PointCloudDataDirectoryModule(
        args.data_dir, num_points=2048, batch_size=16,
        file_mode="voxels", output_mode="voxels", augmentations=False,
        relevant_object_categories=args.categories,
    )
    data_module.setup()

    subdirectory_name = os.path.basename(os.path.normpath(args.checkpoint_dir))
    for file_name in sorted(os.listdir(args.checkpoint_dir)):
        if not file_name.endswith(".ckpt"):
            continue
        checkpoint_path = os.path.join(args.checkpoint_dir, file_name)
        model_name = f"{subdirectory_name}-{file_name[:-5]}"
        # Two-phase LDM runs drop vae-* and latent_diffusion-* checkpoints in
        # the same directory (train_point_ldm.py:59-73,119-133); this script
        # evaluates the VAEs (reference test_point_ldm.py:157 loads VAE3D).
        import json as _json

        with open(checkpoint_path + ".json") as f:
            kind = _json.load(f).get("hparams", {}).get("task", "")
        if kind not in ("vae3d_large", "vae3d"):
            logger.info(f"Skipping non-VAE checkpoint: {file_name} ({kind})")
            continue
        logger.info(f"Testing model: {model_name}")
        task, state, _ = load_task_checkpoint(checkpoint_path)
        test_vae_generation(
            task, state, model_name, logger, args.num_samples, args.threshold
        )
        test_vae_reconstruction(
            task, state, model_name, data_module, logger, args.num_samples,
            args.threshold, args.use_gpu_emd,
        )


if __name__ == "__main__":
    main()
