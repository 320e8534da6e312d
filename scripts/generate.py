#!/usr/bin/env python
"""Generation CLI: load a checkpoint, sample shapes, export PNG/PLY/CSV.

The serving-side entry point. The reference embeds generation inside its
test scripts (test_point_ddpm.py:24-56); this exposes it standalone, with
sampler choice (DDIM default / ancestral DDPM), step count (e.g. 50-step
accelerated DDIM), optional category conditioning with classifier-free
guidance, and mesh fan-out for large sample counts.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import matplotlib.pyplot as plt  # noqa: E402

from shapegen_tpu.ops import voxel_to_points_padded  # noqa: E402
from shapegen_tpu.parallel import make_mesh  # noqa: E402
from shapegen_tpu.train.factory import load_task_checkpoint  # noqa: E402
from shapegen_tpu.utils import (  # noqa: E402
    plot_point_cloud_2d,
    plot_point_cloud_3d,
    save_point_cloud,
    save_to_ply,
)


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--out-dir", default="generated")
    p.add_argument("--num-samples", type=int, default=10)
    p.add_argument("--num-points", type=int, default=None)
    p.add_argument("--num-steps", type=int, default=1000)
    p.add_argument("--sampler", default="ddim", choices=["ddim", "ddpm"])
    p.add_argument("--seed", type=int, default=24)
    p.add_argument("--labels", type=int, nargs="*", default=None,
                   help="category indices for a conditional model")
    p.add_argument("--guidance-scale", type=float, default=1.0)
    p.add_argument("--threshold", type=float, default=0.4,
                   help="voxel threshold for VAE/LDM decodes")
    p.add_argument("--num-devices", type=int, default=None,
                   help="shard sampling over a data mesh")
    p.add_argument("--ply", action="store_true", help="also export .ply files")
    p.add_argument("--csv", action="store_true", help="also export .csv files")
    p.add_argument("--no-png", action="store_true")
    return p.parse_args()


def main():
    args = parse_args()
    os.makedirs(args.out_dir, exist_ok=True)
    key = jax.random.PRNGKey(args.seed)

    task, state, meta = load_task_checkpoint(args.checkpoint)
    kind = meta.get("hparams", {}).get("task", "")

    if kind == "point_diffusion":
        if args.labels:
            samples = task.sample_conditional(
                state, key, jnp.asarray(args.labels),
                num_points=args.num_points, num_steps=args.num_steps,
                guidance_scale=args.guidance_scale,
            )
        elif args.num_devices and args.num_devices > 1:
            mesh = make_mesh(args.num_devices)
            samples = task.sample_sharded(
                state, key, args.num_samples, mesh,
                num_points=args.num_points, num_steps=args.num_steps,
            )
        elif args.sampler == "ddpm":
            samples = task.sample2(
                state, key, args.num_samples, args.num_points, args.num_steps
            )
        else:
            samples = task.sample(
                state, key, args.num_samples, args.num_points, args.num_steps
            )
        clouds = list(jax.device_get(samples))
    elif kind in ("vae3d_large", "vae3d"):
        vox = task.sample_voxels(state, key, args.num_samples)
        grids = jnp.squeeze(vox, axis=-1)
        pts, _, count = voxel_to_points_padded(
            grids, max_points=8192, threshold=args.threshold
        )
        pts, count = jax.device_get((pts, count))
        clouds = [p[:c] for p, c in zip(pts, count)]
    elif kind in ("simple_pointnet_vae", "pointnet_vae"):
        clouds = list(jax.device_get(task.sample(state, key, args.num_samples)))
    else:
        raise SystemExit(f"Cannot generate from task kind {kind!r}")

    for i, cloud in enumerate(clouds):
        stem = os.path.join(args.out_dir, f"sample_{i}")
        if not args.no_png:
            fig = plot_point_cloud_3d(cloud)
            plt.savefig(stem + "_3d.png")
            plt.close(fig)
            fig = plot_point_cloud_2d(cloud)
            plt.savefig(stem + "_2d.png")
            plt.close(fig)
        if args.ply and len(cloud):
            save_to_ply(stem + ".ply", cloud)
        if args.csv and len(cloud):
            save_point_cloud(cloud, stem + ".csv")
    print(f"wrote {len(clouds)} samples to {args.out_dir}")


if __name__ == "__main__":
    main()
