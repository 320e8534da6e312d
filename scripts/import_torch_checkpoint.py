"""Import a reference PyTorch-Lightning checkpoint into this framework.

Usage:
    python scripts/import_torch_checkpoint.py \
        --checkpoint /path/to/reference.ckpt --out /path/to/imported.ckpt \
        [--vae-out /path/to/vae.ckpt]   # required for LatentDiffusion ckpts
        [--num-points 2048]             # override when not recoverable

Detects the source LightningModule (PointCloudDiffusion, LatentDiffusion,
SimplePointNetVAE, PointNetVAE, VAE3D, VAE3DLarge) from its state_dict keys,
converts the weights + BN running stats into the matching flax model's trees,
and writes framework checkpoint director(ies) that
``factory.load_task_checkpoint`` (and hence the test/generate scripts)
restore directly. Optimizer state is re-initialized — the import is a warm
start, not a bitwise training resume.
"""

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        description="Import a reference Lightning .ckpt into a framework checkpoint"
    )
    parser.add_argument("--checkpoint", required=True,
                        help="source Lightning .ckpt file")
    parser.add_argument("--out", required=True,
                        help="output framework checkpoint directory")
    parser.add_argument("--vae-out", default=None,
                        help="output for the embedded VAE (LatentDiffusion only)")
    parser.add_argument("--num-points", type=int, default=None,
                        help="override num_points when the source hparams lack it")
    parser.add_argument("--no-optimizer", action="store_true",
                        help="skip Adam-moment import (fresh optimizer state)")
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO, format="%(message)s")
    log = logging.getLogger("import_torch_checkpoint")

    from shapegen_tpu.train import torch_import

    sd, hp, meta = torch_import.load_lightning_checkpoint(args.checkpoint)
    kind = torch_import.detect_architecture(sd)
    log.info("source: %s (epoch %d, %d tensors)",
             kind, meta["epoch"], len(sd))

    written = torch_import.import_lightning_checkpoint(
        args.checkpoint, args.out, vae_out_path=args.vae_out,
        num_points=args.num_points, import_optimizer=not args.no_optimizer,
    )
    for name, path in written.items():
        log.info("wrote %s -> %s", name, path)
    return 0


if __name__ == "__main__":
    sys.exit(main())
