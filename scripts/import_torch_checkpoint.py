"""Import a reference PyTorch-Lightning checkpoint into this framework.

Usage:
    python scripts/import_torch_checkpoint.py \
        --checkpoint /path/to/reference.ckpt --out /path/to/imported.ckpt \
        [--vae-out /path/to/vae.ckpt]   # required for LatentDiffusion ckpts
        [--num-points 2048]             # override when not recoverable
        [--no-optimizer]                # weights-only warm start

Detects the source LightningModule (PointCloudDiffusion, LatentDiffusion,
SimplePointNetVAE, PointNetVAE, VAE3D, VAE3DLarge) from its state_dict keys,
converts the weights + BN running stats into the matching flax model's trees,
and writes framework checkpoint director(ies) that
``factory.load_task_checkpoint`` (and hence the test/generate scripts)
restore directly. By default the Adam moments, live learning rate, and LR
scheduler state carry over too, so ``Trainer.fit(resume_from=...)`` continues
mid-trajectory; ``--no-optimizer`` skips all of that for a weights-only warm
start with a fresh optimizer.
"""

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Pure host-side conversion: nothing here needs an accelerator, and on this
# image the default backend is the single-client axon TPU tunnel — importing
# a checkpoint must never queue behind (or wedge) a training job, nor push
# hundreds of MB of params through the tunnel just to device_get them back.
os.environ["JAX_PLATFORMS"] = "cpu"


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
                        help="skip Adam-moment/scheduler import (fresh optimizer)")
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO, format="%(message)s")
    log = logging.getLogger("import_torch_checkpoint")

    import jax

    # The image's sitecustomize registers the axon platform at interpreter
    # start; the env var alone doesn't always win (see tests/conftest.py) —
    # pin the platform through the config API before any backend init.
    jax.config.update("jax_platforms", "cpu")

    from shapegen_tpu.train import torch_import

    loaded = torch_import.load_lightning_checkpoint(args.checkpoint)
    sd, _, meta = loaded
    kind = torch_import.detect_architecture(sd)
    log.info("source: %s (epoch %d, %d tensors)",
             kind, meta["epoch"], len(sd))

    written = torch_import.import_lightning_checkpoint(
        args.checkpoint, args.out, vae_out_path=args.vae_out,
        num_points=args.num_points, import_optimizer=not args.no_optimizer,
        loaded=loaded,
    )
    for name, path in written.items():
        log.info("wrote %s -> %s", name, path)
    return 0


if __name__ == "__main__":
    sys.exit(main())
