"""Typed configuration layer with the reference's exact defaults.

The reference has no config system — every knob is a hardcoded constant
edited in place (SURVEY.md §5: train_point_ddpm.py:33-48,
train_point_ldm.py:156-178, test scripts' __main__ blocks). These dataclasses
are the single source of truth for those values; the CLI scripts build their
argparse defaults from them, so running any script with no arguments
reproduces the reference behavior exactly.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple


@dataclasses.dataclass
class DataConfig:
    """data.py + train script defaults."""

    data_dir: str = "data/shape_net_voxel_data_v1"
    num_points: int = 2048           # train_point_ddpm.py:41
    batch_size: int = 16             # train_point_ddpm.py:46
    num_workers: int = 4             # data.py:310
    train_val_split: float = 0.8     # data.py:310
    file_mode: str = "voxels"
    augmentations: bool = False      # train_point_ddpm.py:42
    seed: int = 24                   # pl.seed_everything(24) in all scripts


@dataclasses.dataclass
class DiffusionConfig:
    """PointCloudDiffusion ctor defaults (diffusion.py:15-38)."""

    dim: int = 256                   # instantiated value (diffusion.py:28)
    time_dim: int = 256
    lr: float = 1e-4
    weight_decay: float = 1e-5       # diffusion.py:60
    noise_schedule: str = "cosine"
    linear_min_rate: float = 1e-4    # diffusion.py:32
    linear_max_rate: float = 0.02
    cosine_min_signal_rate: float = 0.02  # diffusion.py:34
    cosine_max_signal_rate: float = 0.95
    num_sample_steps: int = 1000     # diffusion.py:262
    plateau_factor: float = 0.5      # diffusion.py:61
    plateau_patience: int = 5


@dataclasses.dataclass
class LatentDiffusionConfig:
    """LatentDiffusion ctor defaults (diffusion.py:362)."""

    latent_dim: int = 256
    dim: int = 512
    time_dim: int = 256
    lr: float = 1e-4
    noise_schedule: str = "cosine"
    is_voxel_based: bool = True
    sample_threshold: float = 0.4    # diffusion.py:576,620
    cosine_eta_min: float = 1e-6     # diffusion.py:418


@dataclasses.dataclass
class VAE3DLargeConfig:
    """VAE3DLarge ctor defaults (networks.py:2209-2210)."""

    input_shape: Tuple[int, int, int] = (32, 32, 32)
    latent_dim: int = 256
    lr: float = 1e-4
    kl_warmup_epochs: int = 10
    kl_warmup_max_beta: float = 0.1
    kl_annealing_epochs: int = 100
    sample_threshold: float = 0.4    # networks.py:2447


@dataclasses.dataclass
class TrainRunConfig:
    """pl.Trainer + ModelCheckpoint defaults (train_point_ddpm.py:63-85)."""

    max_epochs: int = 500
    save_top_k: int = 10
    ckpt_root: str = "checkpoints"
    tb_dir: str = "lightning_logs"
    categories: Optional[List[str]] = None  # script-specific: ['chair']/['airplane']


@dataclasses.dataclass
class EvalConfig:
    """Test script defaults (test_point_ddpm.py:125-131, test_point_ldm.py:122-128)."""

    num_samples: int = 16
    num_points: int = 2048
    num_steps: int = 1000
    initial_t: float = 0.010         # test_point_ddpm.py:58
    vae_threshold: float = 0.5       # test_point_ldm.py:128
    use_approximate_gpu_emd: bool = False  # metrics.py:160 default


DEFAULTS = {
    "data": DataConfig(),
    "diffusion": DiffusionConfig(),
    "latent_diffusion": LatentDiffusionConfig(),
    "vae3d_large": VAE3DLargeConfig(),
    "train": TrainRunConfig(),
    "eval": EvalConfig(),
}
